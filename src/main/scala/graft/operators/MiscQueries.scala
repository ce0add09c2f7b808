package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-out operators: binary encodings, bitwise aggregates, LATERAL
  * correlated subqueries, and single-scan column profiling (the
  * data-quality step every training-data ingest runs first).
  *
  * Determinism: encodings are byte-exact (hex normalized to lower
  * case — Spark upper-cases hex digits, DuckDB lower-cases); bitwise
  * aggs are order-free integer folds; the profiler emits exact counts
  * and DECIMAL-cast extrema.
  */
object MiscQueries extends QueryPack {

  def queries: Seq[(String, Q)] = Seq(
    // base64 / hex / round-trip decode over text payload prefixes.
    "fn_encode" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          base64(substring($"text", 1, 12).cast(BinaryType)).as("b64"),
          lower(hex(substring($"text", 1, 6).cast(BinaryType))).as("hx"),
          (expr("decode(unbase64(base64(cast(substring(text, 1, 12) AS BINARY))), 'UTF-8')")
            === substring($"text", 1, 12)).as("roundtrip_ok"),
          octet_length(expr("unbase64(base64(cast(text AS BINARY)))"))
            .cast(LongType).as("n_bytes"))
        .orderBy($"doc_id")
    }),

    // Bitwise AND/OR/XOR aggregates per language over doc ids.
    "agg_bitwise" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n"),
          bit_and($"doc_id").as("band"),
          bit_or($"doc_id").as("bor"),
          bit_xor($"doc_id").as("bxor"))
        .orderBy($"lang")
    }),

    // LATERAL correlated derived table (Spark 3.2+/DuckDB): per
    // customer, an aggregate computed by a lateral subquery. Plans as
    // a decorrelated aggregate + outer join, same as sub_correlated.
    "sub_lateral" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("sq_orders")
      Tables.load(s, dir, "customer").createOrReplaceTempView("sq_cust")
      s.sql("""
        SELECT c_custkey, t.n, t.max_price
        FROM sq_cust,
        LATERAL (
          SELECT count(*) AS n,
            CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              AS max_price
          FROM sq_orders WHERE o_custkey = c_custkey) t
        ORDER BY c_custkey""")
    }),

    // Column profiling in ONE scan, exact form: melt the profiled
    // columns map-side (array-of-struct explode — no shuffle), then a
    // two-phase aggregate on (col, value) whose partial side collapses
    // each partition to its distinct values — the shuffle carries only
    // distinct (col, value) pairs with counts, never raw rows (the
    // multi-distinct Expand plan shuffles the same pairs but plans a
    // 3× Expand first; this melt is one narrow projection). The tiny
    // per-value relation then folds to one row per column.
    // At 100 TB the default profiler should be the sketch variant
    // (Profiler.profile / `profile_sketch`): exact n_distinct shuffles
    // every distinct value, a profiler rarely needs that.
    "profile_table" -> ((s, dir) =>
      Profiler.profile(Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        exact = true)),

    // Sketch profiler: HLL++ n_distinct (rsd 2%) — the 100-TB default.
    // No cross-engine oracle (approx result); ProfilerSpec asserts its
    // exact fields (n, n_nonnull, extrema) bit-equal to the exact
    // profiler and n_distinct within 3·rsd of exact at sf0.001+sf0.01.
    "profile_sketch" -> ((s, dir) =>
      Profiler.profile(Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        exact = false)),

    // Count-min sketch heavy hitters. Unlike HLL, a CMS with FIXED
    // hash functions is fully deterministic, so the whole sketch —
    // d=4 rows × w=251 counters, built from affine hashes over the
    // same polynomial term hash the simhash family uses — cross-checks
    // exactly against DuckDB. Scale: the sketch is a two-phase agg
    // whose shuffle carries AT MOST d·w = 1004 cells regardless of
    // corpus size (map-side partial counts ARE the CMS merge — the
    // sketch is mergeable by construction); the top-k query side is
    // TakeOrderedAndProject (no global window) and probes the tiny
    // sketch via a broadcast join. est >= true_cnt guaranteed
    // (PropertyLawsSpec); output shows real bucket collisions at
    // sf0.01 (e.g. 'scan' estimated ~2x its true count).
    "sketch_cms" -> ((s, dir) => {
      import s.implicits._
      val as = Seq(131L, 137L, 139L, 149L)
      val bs = Seq(7L, 11L, 13L, 17L)
      graft.functions.TermHash.register(s)
      val termHash = "termhash(term, 31L, 1048576L)"
      def bucketCols = array((0 until 4).map(j =>
        pmod(lit(as(j)) * $"th" + lit(bs(j)), lit(251))): _*)
      val terms = Tables.load(s, dir, "documents")
        .select(explode(split(lower($"text"), " ")).as("term"))
        .filter($"term" =!= "")
      val sketch = terms.withColumn("th", expr(termHash))
        .select(posexplode(bucketCols).as(Seq("j", "bucket")))
        .groupBy($"j", $"bucket").agg(count(lit(1)).as("cnt"))
      val top = terms.groupBy($"term").agg(count(lit(1)).as("true_cnt"))
        .orderBy($"true_cnt".desc, $"term").limit(20)
      top.withColumn("th", expr(termHash))
        .select($"term", $"true_cnt",
          posexplode(bucketCols).as(Seq("j", "bucket")))
        .join(broadcast(sketch), Seq("j", "bucket"))
        .groupBy($"term", $"true_cnt").agg(min($"cnt").as("est"))
        .orderBy($"true_cnt".desc, $"term")
    }),

    // Bloom-filter membership sketch (r7) — like sketch_kmv/sketch_cms,
    // a sketch whose STATE is engine-independent (k=4 bit positions per
    // key from md5, m=4096 bits), so the full state digest and every
    // membership verdict hash-match DuckDB exactly. The set-bit
    // relation is OR-mergeable by construction (distinct union — same
    // idempotent merge as agg_bitmap_distinct), the filter is constant
    // width regardless of row count, and the probe side is a broadcast-
    // tiny relation: this is the data-level realization of what the
    // runtime bloom join (InjectRuntimeFilter, PlanShapeSpec) does
    // inside the optimizer. False-positive/no-false-negative laws in
    // BloomSketchSpec; n_candidates here shows the probe outcome
    // (~150 true members of 200 probes, plus any FPs) per group.
    "sketch_bloom" -> ((s, dir) => {
      import s.implicits._
      val m = 4096L
      def bloomPos(key: String) =
        explode(array((0 until 4).map { i =>
          pmod(expr(s"CAST(conv(substr(md5(CAST($key AS STRING) " +
            s"|| ':$i'), 1, 8), 16, 10) AS BIGINT)"), lit(m))
        }: _*)).as("pos")
      val ins = Tables.load(s, dir, "events")
        .select($"event_type", $"user_id").distinct()
      val bits = ins.select($"event_type", bloomPos("user_id"))
        .distinct()
      val state = bits.groupBy($"event_type")
        .agg(count(lit(1)).as("bits_set"),
          md5(array_join(transform(sort_array(collect_list($"pos")),
            _.cast(StringType)), ",")).as("state_md5"))
      val exact = ins.groupBy($"event_type")
        .agg(count(lit(1)).as("n_exact"))
      val probes = s.range(0, 200).select($"id".as("probe"))
      val hits = probes.select($"probe", bloomPos("probe"))
        .join(bits, Seq("pos"))
        .groupBy($"event_type", $"probe").agg(count(lit(1)).as("nh"))
        .filter($"nh" === 4)
        .groupBy($"event_type").agg(count(lit(1)).as("n_candidates"))
      state.join(exact, "event_type").join(hits, "event_type")
        .select($"event_type", $"bits_set", $"state_md5",
          $"n_exact", $"n_candidates")
        .orderBy($"event_type")
    }),

    // CDC/MERGE apply (r7): reconcile a base table with a changeset of
    // upserts/deletes — the table-maintenance primitive every
    // incremental 100-TB pipeline runs (compaction of a CDC log onto a
    // snapshot). The changeset here is derived deterministically from
    // the base (updates for key%10==3, deletes for key%10==7, 50 fresh
    // inserts), and apply is ONE full-outer join on the key +
    // row-level precedence (D drops, U/I take the change row, absent
    // keeps base). Full-outer cannot broadcast (both unmatched sides
    // must survive), so it plans as a single hash-partitioned
    // SortMergeJoin — at 100 TB the base side's shuffle disappears
    // when base and changelog are bucketed/storage-partitioned on the
    // key (UdfAndBucketingSpec demonstrates that co-location), which
    // is exactly how table-format MERGE implementations schedule it.
    // The whole-row output hash-checks every precedence branch.
    "cdc_apply" -> ((s, dir) => {
      import s.implicits._
      val base = Tables.load(s, dir, "customer")
      val upd = base.filter(pmod($"c_custkey", lit(10L)) === 3)
        .select($"c_custkey".as("key"), lit("U").as("op"),
          (Det.money($"c_acctbal") + 100).cast(DoubleType).as("new_bal"))
      val del = base.filter(pmod($"c_custkey", lit(10L)) === 7)
        .select($"c_custkey".as("key"), lit("D").as("op"),
          lit(null).cast(DoubleType).as("new_bal"))
      // Insert keys live at 10^9+ — far above any staged key space
      // (ScaleBench offsets fact keys by replica*10^6, so a 10^6 base
      // COLLIDED with replica-1 customers at the sf1 staging: the
      // collided key drew both a U and an I change row, the
      // full-outer join fanned out to two rows, and their tie order
      // under ORDER BY c_custkey is engine-dependent — caught by
      // dev/scalecheck.py, r11).
      val ins = s.range(0, 50)
        .select(($"id" + 1000000000L).as("key"), lit("I").as("op"),
          ($"id".cast(DoubleType) + 0.25).as("new_bal"))
      val changes = upd.unionByName(del).unionByName(ins)
      base.join(changes, base("c_custkey") === changes("key"),
          "full_outer")
        .filter(coalesce($"op", lit("")) =!= "D")
        .select(coalesce($"c_custkey", $"key").as("c_custkey"),
          coalesce($"c_mktsegment", lit("NEWSEG")).as("seg"),
          when($"op".isin("U", "I"), $"new_bal")
            .otherwise($"c_acctbal").as("bal"))
        .orderBy($"c_custkey")
    }))

  def oracle: Seq[(String, String)] = Seq(
    "fn_encode" ->
      """SELECT doc_id,
        |  to_base64(encode(substring(text, 1, 12))) AS b64,
        |  lower(hex(encode(substring(text, 1, 6)))) AS hx,
        |  decode(from_base64(to_base64(encode(substring(text, 1, 12)))))
        |    = substring(text, 1, 12) AS roundtrip_ok,
        |  CAST(octet_length(from_base64(to_base64(encode(text))))
        |    AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "agg_bitwise" ->
      """SELECT lang, count(*) AS n,
        |  bit_and(doc_id) AS band, bit_or(doc_id) AS bor,
        |  bit_xor(doc_id) AS bxor
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "sub_lateral" ->
      """SELECT c_custkey, t.n, t.max_price
        |FROM customer,
        |LATERAL (
        |  SELECT count(*) AS n,
        |    CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS max_price
        |  FROM orders WHERE o_custkey = c_custkey) t
        |ORDER BY c_custkey""".stripMargin,

    "profile_table" ->
      """WITH a AS (SELECT
        |  count(*) AS n,
        |  count(l_quantity) AS nn_q, count(DISTINCT l_quantity) AS nd_q,
        |  CAST(min(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_q,
        |  CAST(max(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_q,
        |  count(l_extendedprice) AS nn_p,
        |  count(DISTINCT l_extendedprice) AS nd_p,
        |  CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS min_p,
        |  CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS max_p,
        |  count(l_discount) AS nn_d, count(DISTINCT l_discount) AS nd_d,
        |  CAST(min(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS min_d,
        |  CAST(max(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS max_d
        |  FROM lineitem)
        |SELECT n, 'l_quantity' AS col, nn_q AS n_nonnull, nd_q AS n_distinct,
        |  min_q AS min_v, max_q AS max_v FROM a
        |UNION ALL
        |SELECT n, 'l_extendedprice', nn_p, nd_p, min_p, max_p FROM a
        |UNION ALL
        |SELECT n, 'l_discount', nn_d, nd_d, min_d, max_d FROM a
        |ORDER BY col""".stripMargin,

    // Same affine-over-polynomial hash arithmetic, verbatim. DuckDB's
    // init-less list_reduce equals Spark's 0-seeded aggregate because
    // 0*31 + c1 = c1 (and single-char terms stay < the modulus).
    "sketch_cms" ->
      """WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |t AS (SELECT term FROM tok WHERE term <> ''),
        |h AS (SELECT term, list_reduce(list_transform(string_split(term, ''),
        |    c -> CAST(ascii(c) AS BIGINT)),
        |    (h, c) -> (h * 31 + c) % 1048576) AS th FROM t),
        |b AS (SELECT th, j,
        |    (CAST(CASE j WHEN 0 THEN 131 WHEN 1 THEN 137
        |          WHEN 2 THEN 139 ELSE 149 END AS BIGINT) * th
        |     + CASE j WHEN 0 THEN 7 WHEN 1 THEN 11
        |       WHEN 2 THEN 13 ELSE 17 END) % 251 AS bucket
        |  FROM h CROSS JOIN generate_series(0, 3) AS gj(j)),
        |sk AS (SELECT j, bucket, count(*) AS cnt FROM b GROUP BY j, bucket),
        |tc AS (SELECT term, count(*) AS true_cnt FROM t GROUP BY term
        |  ORDER BY true_cnt DESC, term LIMIT 20),
        |qh AS (SELECT DISTINCT term, th FROM h),
        |q AS (SELECT tc.term, tc.true_cnt, gj.j,
        |    (CAST(CASE gj.j WHEN 0 THEN 131 WHEN 1 THEN 137
        |          WHEN 2 THEN 139 ELSE 149 END AS BIGINT) * qh.th
        |     + CASE gj.j WHEN 0 THEN 7 WHEN 1 THEN 11
        |       WHEN 2 THEN 13 ELSE 17 END) % 251 AS bucket
        |  FROM tc JOIN qh ON tc.term = qh.term
        |  CROSS JOIN generate_series(0, 3) AS gj(j))
        |SELECT q.term, q.true_cnt, min(sk.cnt) AS est
        |FROM q JOIN sk ON sk.j = q.j AND sk.bucket = q.bucket
        |GROUP BY q.term, q.true_cnt
        |ORDER BY true_cnt DESC, term""".stripMargin,

    // Same md5-derived positions (8 hex chars → BIGINT, the
    // sketch_kmv hex bridge), same distinct-union merge, same
    // all-4-bits membership rule — state digest and candidate counts
    // are exact in both engines.
    "sketch_bloom" ->
      """WITH ins AS (SELECT DISTINCT event_type, user_id FROM events),
        |pos AS (SELECT DISTINCT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' || i),
        |         1, 8) AS BIGINT) % 4096 AS pos
        |  FROM ins CROSS JOIN generate_series(0, 3) g(i)),
        |st AS (SELECT event_type, count(*) AS bits_set,
        |    md5(string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos))
        |      AS state_md5
        |  FROM pos GROUP BY event_type),
        |ex AS (SELECT event_type, count(*) AS n_exact
        |  FROM ins GROUP BY event_type),
        |pp AS (SELECT probe,
        |    CAST('0x' || substr(md5(CAST(probe AS VARCHAR) || ':' || i),
        |         1, 8) AS BIGINT) % 4096 AS pos
        |  FROM generate_series(0, 199) gp(probe)
        |  CROSS JOIN generate_series(0, 3) g(i)),
        |hit AS (SELECT event_type, probe
        |  FROM pp JOIN pos USING (pos)
        |  GROUP BY event_type, probe HAVING count(*) = 4),
        |hc AS (SELECT event_type, count(*) AS n_candidates
        |  FROM hit GROUP BY event_type)
        |SELECT event_type, bits_set, state_md5, n_exact, n_candidates
        |FROM st JOIN ex USING (event_type) JOIN hc USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // Same derived changeset, same full-outer precedence.
    "cdc_apply" ->
      """WITH upd AS (SELECT c_custkey AS key, 'U' AS op,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DOUBLE)
        |      AS new_bal
        |  FROM customer WHERE c_custkey % 10 = 3),
        |del AS (SELECT c_custkey AS key, 'D' AS op,
        |    CAST(NULL AS DOUBLE) AS new_bal
        |  FROM customer WHERE c_custkey % 10 = 7),
        |ins AS (SELECT CAST(1000000000 + k AS BIGINT) AS key, 'I' AS op,
        |    CAST(k AS DOUBLE) + 0.25 AS new_bal
        |  FROM generate_series(0, 49) g(k)),
        |ch AS (SELECT * FROM upd UNION ALL SELECT * FROM del
        |       UNION ALL SELECT * FROM ins)
        |SELECT COALESCE(c_custkey, key) AS c_custkey,
        |  COALESCE(c_mktsegment, 'NEWSEG') AS seg,
        |  CASE WHEN op IN ('U', 'I') THEN new_bal
        |       ELSE c_acctbal END AS bal
        |FROM customer FULL OUTER JOIN ch ON c_custkey = key
        |WHERE COALESCE(op, '') <> 'D'
        |ORDER BY c_custkey""".stripMargin)
}
