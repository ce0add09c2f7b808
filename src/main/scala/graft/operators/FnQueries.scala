package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2.G — scalar function families (SURVEY.md §2.G, rows fn_*).
  *
  * Cross-engine determinism (§7.4 P1/P4):
  * - DuckDB returns BIGINT where Spark returns INT (length, year,
  *   row_number…) — Spark casts up to LongType.
  * - libm functions (ln, log10, pow) are only ~1-ulp accurate and the
  *   two engines use different implementations, so raw outputs may
  *   differ in the last bit. They are therefore emitted through exact
  *   envelopes: floor(ln x), pow with exactly-representable base-2
  *   results. sqrt is IEEE-754 correctly-rounded in both — safe raw.
  * - round() on raw doubles is implementation-defined at boundaries;
  *   we round on DECIMAL (exact, half-up == half-away for positives).
  * - Array/map outputs are projected to sorted CSV / scalar entries
  *   (list representations don't hash identically cross-engine).
  *
  * Scale: everything here is a narrow projection or a two-phase hash
  * aggregate; all expressions are codegen'd built-ins (no UDFs).
  */
object FnQueries extends QueryPack {
  import Det._

  def queries: Seq[(String, Q)] = Seq(
    // concat / substring / case / trim / length / pad / replace / split
    "fn_string" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .select($"c_custkey",
          upper($"c_name").as("up"),
          lower($"c_name").as("lo"),
          length($"c_name").cast(LongType).as("len"),
          concat(trim($"c_mktsegment"), lit("-"), $"c_name").as("cat"),
          lpad($"c_mktsegment", 12, "*").as("pad"),
          expr("replace(c_name, 'Customer', 'Cust')").as("rep"),
          split($"c_name", "#").getItem(1).as("suffix"),
          substring($"c_name", 1, 8).as("sub"))
        .orderBy($"c_custkey")
    }),

    // regexp_extract / regexp_replace / rlike
    "fn_regex" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .select($"c_custkey",
          regexp_extract($"c_name", "(\\d+)$", 1).cast(LongType)
            .as("cnum"),
          regexp_replace($"c_name", "\\d", "#").as("masked"),
          $"c_name".rlike("[13579]$").as("odd_tail"))
        .filter(regexp_extract($"c_name", "(\\d+)$", 1) =!= "")
        .orderBy($"c_custkey")
    }),

    // year/month/day, date_trunc, datediff, date_add, unix_timestamp.
    // All inputs are midnight-aligned ms timestamps, so day-diffs and
    // epoch seconds are whole numbers on both engines.
    "fn_date" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .select(date_trunc("month", $"o_orderdate").as("month"),
                datediff($"l_shipdate", $"o_orderdate").as("lat"),
                date_add($"o_orderdate", 30).as("d30"))
        .groupBy($"month")
        .agg(count(lit(1)).as("n"),
             avg($"lat").as("avg_lat"),
             min($"lat").cast(LongType).as("min_lat"),
             max($"lat").cast(LongType).as("max_lat"),
             max($"d30").as("max_d30"))
        .select($"month", year($"month").as("yr"), month($"month").as("mo"),
                unix_timestamp($"month").as("epoch_s"),
                $"n", $"avg_lat", $"min_lat", $"max_lat", $"max_d30")
        .orderBy($"month")
    }),

    // round/abs/ceil/floor/pow/sqrt/ln/log10/pmod/sign — see header for
    // which are exact-enveloped.
    "fn_math" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select($"o_orderkey",
          round(money($"o_totalprice"), 1).cast(DoubleType).as("r1"),
          abs(money($"o_totalprice") - 200000).cast(DoubleType).as("ab"),
          ceil($"o_totalprice" / 1000).as("ce"),
          floor($"o_totalprice" / 1000).as("fl"),
          pow(lit(2.0), pmod($"o_orderkey", lit(10))).as("pw2"),
          sqrt($"o_totalprice").as("sq"),
          floor(log($"o_totalprice")).as("lnf"),
          floor(log10($"o_totalprice")).as("lgf"),
          pmod($"o_orderkey", lit(7)).as("pm"),
          signum($"o_totalprice" - 200000).as("sg"))
        .orderBy($"o_orderkey")
    }),

    // array / size / contains / sort_array / slice / distinct / flatten,
    // projected to scalars+CSV for the cross-engine compare.
    "fn_array" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .agg(array_sort(collect_set($"event_type")).as("arr"))
        .select($"user_id",
          size($"arr").cast(LongType).as("n_types"),
          array_contains($"arr", "purchase").as("has_purchase"),
          array_join(slice($"arr", 1, 2), ",").as("first2_csv"),
          array_join($"arr", ",").as("all_csv"),
          size(array_distinct($"arr")).cast(LongType).as("n_distinct"),
          size(flatten(array($"arr", $"arr"))).cast(LongType).as("n_flat"))
        .orderBy($"user_id")
    }),

    // Higher-order functions over the 64-dim embeddings: transform,
    // aggregate (sum of squares fold), filter, exists, zip_with.
    // Elements are cast float→double before arithmetic so both engines
    // fold identical doubles in identical order.
    "fn_array_hof" -> ((s, dir) => {
      import s.implicits._
      val vd = transform(col("embedding"), x => x.cast(DoubleType))
      val ssq = aggregate(vd, lit(0.0), (acc, x) => acc + x * x)
      Tables.load(s, dir, "embeddings")
        .select($"vec_id",
          sqrt(ssq).as("norm"),
          size(filter(vd, x => x > 0)).cast(LongType).as("n_pos"),
          exists(vd, x => abs(x) > 0.5).as("has_big"),
          aggregate(zip_with(vd, vd, (a, b) => a * b), lit(0.0),
                    (acc, x) => acc + x).as("dot_self"))
        .orderBy($"vec_id")
    }),

    // Generator surface (2.J UDTF row): posexplode of the token list.
    "fn_explode" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", posexplode(split($"text", " ")))
        .select($"doc_id", ($"pos" + 1).cast(LongType).as("pos"),
                $"col".as("tok"))
        .orderBy($"doc_id", $"pos")
    }),

    // Map build/access: map(event_type → count) per user, projected to
    // sorted entries per §7.4 P4 (raw maps don't hash cross-engine).
    "fn_map" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
        .groupBy($"user_id")
        .agg(map_from_entries(
          array_sort(collect_list(struct($"event_type", $"n")))).as("m"))
        .select($"user_id",
          array_join(map_keys($"m"), ",").as("keys_csv"),
          size($"m").cast(LongType).as("n_keys"),
          coalesce(element_at($"m", "click"), lit(0L)).as("click_n"),
          aggregate(map_values($"m"), lit(0L), (a, x) => a + x)
            .as("vals_sum"))
        .orderBy($"user_id")
    }),

    // JSON: get_json_object / from_json / json_tuple / to_json over the
    // props column (the semi-structured "multimodal" surface).
    "fn_json" -> ((s, dir) => {
      import s.implicits._
      val st = StructType(Seq(StructField("k", LongType)))
      Tables.load(s, dir, "events")
        .select($"event_id", $"props",
                from_json($"props", st).as("p"),
                json_tuple($"props", "k").as("k3s"))
        .select($"event_id",
          get_json_object($"props", "$.k").cast(LongType).as("k1"),
          $"p.k".as("k2"),
          $"k3s".cast(LongType).as("k3"),
          to_json(struct($"p.k".as("k"))).as("j"))
        .orderBy($"event_id")
    }),

    // Struct create / field access / star-expand: group by a nested
    // (user_id, day) struct key, then expand it back to columns.
    "fn_struct" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .select(struct($"user_id", date_trunc("day", $"ts").as("day"))
                  .as("key"),
                $"value")
        .groupBy($"key")
        .agg(count(lit(1)).as("n"), dsum($"value").as("val_sum"))
        .select($"key.user_id", $"key.day", $"n", $"val_sum")
        .orderBy($"user_id", $"day")
    }),

    // VARIANT (Spark 4's semi-structured type): parse_json once into a
    // binary variant, then typed path extraction — the modern
    // schema-on-read path (no per-access string re-parsing, unlike
    // get_json_object). Oracle extracts the same paths with DuckDB's
    // JSON functions.
    "fn_variant" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .withColumn("v", parse_json($"props"))
        .select($"event_id",
          expr("variant_get(v, '$.k', 'bigint')").as("k_num"),
          expr("CAST(is_variant_null(variant_get(v, '$.missing')) " +
            "OR variant_get(v, '$.missing') IS NULL AS BOOLEAN)")
            .as("missing_null"),
          expr("variant_get(v, '$', 'string')").as("as_json"))
        .orderBy($"event_id")
    }),

    // URL parsing (parse_url): host/path/query extraction from
    // deterministically constructed URLs — the web-corpus ingest
    // scalar. DuckDB has no URL functions; the oracle mirrors with
    // regexes over the same construction.
    "fn_url" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .withColumn("url", concat(lit("https://ex"),
          pmod($"doc_id", lit(7L)), lit(".org/"), $"lang",
          lit("/d"), $"doc_id", lit("?src="), $"source"))
        .select($"doc_id", $"url",
          parse_url($"url", lit("HOST")).as("host"),
          parse_url($"url", lit("PATH")).as("path"),
          parse_url($"url", lit("QUERY")).as("query"),
          parse_url($"url", lit("QUERY"), lit("src")).as("src_param"))
        .orderBy($"doc_id")
    }),

    // Edit-distance fuzzy matching (levenshtein) — the scalar behind
    // fuzzy dedup/entity resolution. Distances to a mutated copy and
    // to a fixed probe; integer-exact.
    "fn_levenshtein" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .select($"c_custkey",
          levenshtein($"c_name", regexp_replace($"c_name", "0", "o"))
            .cast(LongType).as("d_mut"),
          levenshtein($"c_name", lit("Customer#000000001"))
            .cast(LongType).as("d_probe"))
        .orderBy($"c_custkey")
    }),

    // Cryptographic digests over document text — the content-address
    // every dedup/storage layer keys on. Pure map-side codegen.
    "fn_hash" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          md5($"text".cast(BinaryType)).as("h_md5"),
          sha2($"text".cast(BinaryType), 256).as("h_sha256"),
          md5(concat($"lang", lit("|"), $"source").cast(BinaryType))
            .as("h_meta"))
        .orderBy($"doc_id")
    }),

    // XML ingest (Spark 4 from_xml): records synthesized from nation
    // so the parse is oracle-checkable against the clean columns.
    "fn_xml" -> ((s, dir) => {
      import s.implicits._
      val xml = Tables.load(s, dir, "nation")
        .select($"n_nationkey", concat(
          lit("<rec><k>"), $"n_nationkey",
          lit("</k><name>"), $"n_name",
          lit("</name><rg>"), $"n_regionkey",
          lit("</rg></rec>")).as("x"))
      xml.select($"n_nationkey",
          expr("from_xml(x, 'k INT, name STRING, rg INT')").as("r"))
        .select($"n_nationkey", $"r.k".as("k"),
                $"r.name".as("name"), $"r.rg".as("rg"))
        .orderBy($"n_nationkey")
    }),

    // Collated grouping (Spark 4 collations): UTF8_LCASE makes GROUP
    // BY / equality case-insensitive WITHOUT rewriting values through
    // lower() — at scale that keeps the original strings intact for
    // output while the grouping key, join key, and comparisons fold
    // case in the collator. Mixed-case input synthesized per row
    // parity; n_variants counts the case forms merged per group. The
    // oracle mirrors the SEMANTICS via lower() grouping (equivalent
    // for this ASCII fixture — DuckDB 1.0 has no per-expression
    // collation).
    "fn_collation" -> ((s, dir) => {
      Tables.load(s, dir, "part")
        .selectExpr("p_partkey",
          "CASE WHEN p_partkey % 2 = 0 THEN lower(p_type) ELSE p_type" +
            " END AS typ")
        .createOrReplaceTempView("col_part")
      s.sql("""
        SELECT count(*) AS n, count(DISTINCT typ) AS n_variants,
          min(typ) AS v_min, max(typ) AS v_max
        FROM col_part
        GROUP BY collate(typ, 'UTF8_LCASE')
        ORDER BY v_min, v_max""")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    "fn_string" ->
      """SELECT c_custkey, upper(c_name) AS up, lower(c_name) AS lo,
        |  CAST(length(c_name) AS BIGINT) AS len,
        |  concat(trim(c_mktsegment), '-', c_name) AS cat,
        |  lpad(c_mktsegment, 12, '*') AS pad,
        |  replace(c_name, 'Customer', 'Cust') AS rep,
        |  string_split(c_name, '#')[2] AS suffix,
        |  substring(c_name, 1, 8) AS sub
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_regex" ->
      """SELECT c_custkey,
        |  CAST(regexp_extract(c_name, '(\d+)$', 1) AS BIGINT) AS cnum,
        |  regexp_replace(c_name, '\d', '#', 'g') AS masked,
        |  regexp_matches(c_name, '[13579]$') AS odd_tail
        |FROM customer
        |WHERE regexp_extract(c_name, '(\d+)$', 1) <> ''
        |ORDER BY c_custkey""".stripMargin,

    "fn_date" ->
      """WITH j AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
        |           AS month,
        |         date_diff('day', o_orderdate, l_shipdate) AS lat,
        |         o_orderdate + INTERVAL 30 DAY AS d30
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT month,
        |  CAST(year(month) AS INTEGER) AS yr,
        |  CAST(month(month) AS INTEGER) AS mo,
        |  CAST(epoch(month) AS BIGINT) AS epoch_s,
        |  COUNT(*) AS n,
        |  AVG(lat) AS avg_lat,
        |  CAST(MIN(lat) AS BIGINT) AS min_lat,
        |  CAST(MAX(lat) AS BIGINT) AS max_lat,
        |  CAST(MAX(d30) AS DATE) AS max_d30
        |FROM j GROUP BY month ORDER BY month""".stripMargin,

    "fn_math" ->
      """SELECT o_orderkey,
        |  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS r1,
        |  CAST(abs(CAST(o_totalprice AS DECIMAL(18,2)) - 200000) AS DOUBLE) AS ab,
        |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ce,
        |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS fl,
        |  pow(2.0, ((o_orderkey % 10) + 10) % 10) AS pw2,
        |  sqrt(o_totalprice) AS sq,
        |  CAST(floor(ln(o_totalprice)) AS BIGINT) AS lnf,
        |  CAST(floor(log10(o_totalprice)) AS BIGINT) AS lgf,
        |  ((o_orderkey % 7) + 7) % 7 AS pm,
        |  CAST(sign(o_totalprice - 200000) AS DOUBLE) AS sg
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_array" ->
      """WITH a AS (
        |  SELECT user_id,
        |         list_sort(list_distinct(list(event_type))) AS arr
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  CAST(len(arr) AS BIGINT) AS n_types,
        |  list_contains(arr, 'purchase') AS has_purchase,
        |  array_to_string(arr[1:2], ',') AS first2_csv,
        |  array_to_string(arr, ',') AS all_csv,
        |  CAST(len(list_distinct(arr)) AS BIGINT) AS n_distinct,
        |  CAST(len(flatten([arr, arr])) AS BIGINT) AS n_flat
        |FROM a ORDER BY user_id""".stripMargin,

    "fn_array_hof" ->
      """WITH v AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |                        x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings)
        |SELECT vec_id,
        |  sqrt(list_reduce(list_transform(vd, x -> x * x),
        |                   (a, b) -> a + b)) AS norm,
        |  CAST(len(list_filter(vd, x -> x > 0)) AS BIGINT) AS n_pos,
        |  len(list_filter(vd, x -> abs(x) > 0.5)) > 0 AS has_big,
        |  list_reduce(list_transform(vd, x -> x * x),
        |              (a, b) -> a + b) AS dot_self
        |FROM v ORDER BY vec_id""".stripMargin,

    "fn_explode" ->
      """SELECT doc_id,
        |  unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
        |  unnest(string_split(text, ' ')) AS tok
        |FROM documents ORDER BY doc_id, pos""".stripMargin,

    "fn_map" ->
      """WITH cnt AS (
        |  SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS keys_csv,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  COALESCE(MAX(CASE WHEN event_type = 'click' THEN n END), 0)
        |    AS click_n,
        |  CAST(SUM(n) AS BIGINT) AS vals_sum
        |FROM cnt GROUP BY user_id ORDER BY user_id""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k1,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k2,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k3,
        |  CASE WHEN json_extract_string(props, '$.k') IS NULL THEN '{}'
        |       ELSE '{"k":' || json_extract_string(props, '$.k') || '}'
        |  END AS j
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_struct" ->
      """SELECT user_id,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin,

    "fn_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |  json_extract(props, '$.missing') IS NULL AS missing_null,
        |  CAST(json_extract(props, '$') AS VARCHAR) AS as_json
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_url" ->
      """WITH u AS (SELECT doc_id,
        |    'https://ex' || CAST(doc_id % 7 AS VARCHAR) || '.org/'
        |      || lang || '/d' || CAST(doc_id AS VARCHAR)
        |      || '?src=' || source AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |  regexp_extract(url, '^https://([^/]+)/', 1) AS host,
        |  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '\?(.*)$', 1) AS query,
        |  regexp_extract(url, 'src=([^&]*)', 1) AS src_param
        |FROM u ORDER BY doc_id""".stripMargin,

    "fn_levenshtein" ->
      """SELECT c_custkey,
        |  CAST(levenshtein(c_name, regexp_replace(c_name, '0', 'o', 'g'))
        |    AS BIGINT) AS d_mut,
        |  CAST(levenshtein(c_name, 'Customer#000000001') AS BIGINT)
        |    AS d_probe
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_hash" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256,
        |  md5(lang || '|' || source) AS h_meta
        |FROM documents ORDER BY doc_id""".stripMargin,

    // DuckDB has no XML parser; the records are synthesized from the
    // clean columns, so the oracle IS those columns — a hash-match
    // proves from_xml recovered them exactly.
    "fn_xml" ->
      """SELECT n_nationkey, n_nationkey AS k, n_name AS name,
        |  n_regionkey AS rg
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "fn_collation" ->
      """WITH p AS (SELECT CASE WHEN p_partkey % 2 = 0
        |    THEN lower(p_type) ELSE p_type END AS typ FROM part)
        |SELECT count(*) AS n, count(DISTINCT typ) AS n_variants,
        |  min(typ) AS v_min, max(typ) AS v_max
        |FROM p GROUP BY lower(typ) ORDER BY v_min, v_max""".stripMargin
  )
}
