package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-3 training-pipeline utility operators (SURVEY.md §2.M):
  * document chunking, deterministic stratified splits, PII redaction,
  * benchmark-contamination checks, histogramming, boolean aggregates,
  * fallible casts, and unpivot/melt reshaping.
  *
  * Determinism: splits use pure affine integer hashing (no engine RNG);
  * chunk boundaries are arithmetic over char offsets; redaction
  * patterns are fixed regexes valid in both Java regex and RE2;
  * histogram buckets floor a single IEEE division (bit-identical
  * cross-engine); every query ends in a total ORDER BY.
  *
  * Scale design (100 TB):
  * - `text_chunk` is a map-side explode — chunks never shuffle except
  *   for the driver-contract final sort.
  * - `sample_stratified` needs no global state: membership is a pure
  *   row-local hash, so the split is reproducible on any cluster
  *   layout and resharding-safe (the classic mod-hash holdout split).
  * - `text_contamination` shuffles on the n-gram join key — the same
  *   sharded shape as the dedup family, never an all-pairs scan; the
  *   benchmark side is distinct-reduced (benchmark corpora are small)
  *   and broadcast.
  * - `fn_unpivot` melts an already-aggregated frame (3 rows in, 9 out);
  *   at scale the melt happens after reduction, not on raw rows.
  */
object PipelineQueries extends QueryPack {

  /** Benchmark word-5-gram contamination hits per corpus doc —
    * session-cached because BOTH the detection key
    * (text_contamination) and the action key (text_decontaminate)
    * consume one build. The bench gram set is distinct-reduced then
    * broadcast into a left-semi join (r6 — replaced the corpus-wide
    * gram window). */
  private[operators] def contamHits(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.SessionCache.cached(s, s"contam.hits:$dir") {
      import s.implicits._
      def grams(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("toks", split(lower($"text"), " "))
        .select($"doc_id", explode(expr(
          "CASE WHEN size(toks) < 5 THEN array() " +
            "ELSE transform(sequence(1, size(toks) - 4), " +
            "i -> array_join(slice(toks, i, 5), ' ')) END")).as("gram"))
      val docs = Tables.load(s, dir, "documents")
      val benchGrams = grams(docs.filter($"source" === "src0"))
        .select($"gram").distinct()
      grams(docs.filter($"source" =!= "src0"))
        .join(broadcast(benchGrams), Seq("gram"), "left_semi")
        .groupBy($"doc_id").agg(count_distinct($"gram").as("n_hits"))
    }

  def queries: Seq[(String, Q)] = Seq(
    // Fixed-size char chunking with overlap (chunk 200, stride 150) —
    // the standard pre-tokenization step for embedding/training windows.
    "text_chunk" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"text",
          // Guard: sequence(start > stop, +step) throws in Spark while
          // the oracle's generate_series returns empty — an empty doc
          // must yield zero chunks, not fail the job (same guard as
          // dedup_ngram / text_contamination).
          explode(expr("CASE WHEN length(text) < 1 THEN array() " +
            "ELSE sequence(1, length(text), 150) END")).as("start"))
        .select($"doc_id",
          expr("CAST((start - 1) div 150 + 1 AS BIGINT)").as("chunk_id"),
          $"start".cast(LongType).as("start"),
          length(expr("substring(text, start, 200)")).cast(LongType)
            .as("chunk_len"),
          expr("substring(text, start, 200)").as("chunk"))
        .orderBy($"doc_id", $"chunk_id")
    }),

    // Deterministic stratified train/val/test split: membership is an
    // affine hash of the row key — no RNG, reproducible under any
    // partitioning. Emits per (lang, split) audit counts.
    "sample_stratified" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .withColumn("h", pmod($"doc_id" * 2654435761L + 40503L, lit(1000L)))
        .withColumn("split",
          when($"h" < 800, "train").when($"h" < 900, "val")
            .otherwise("test"))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n"),
             min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
        .orderBy($"lang", $"split")
    }),

    // PII redaction: emails then phone numbers masked with fixed
    // regexes; redaction counts kept for audit. The PII-ish prefix is
    // synthesized deterministically from doc_id (the fixture corpus
    // contains none), so the match/mask path is exercised end to end.
    "text_pii" -> ((s, dir) => {
      import s.implicits._
      val raw = concat(lit("contact u"), $"doc_id".cast(StringType),
        lit("@ex.org ph 555-01"),
        lpad(pmod($"doc_id", lit(100L)).cast(StringType), 2, "0"),
        lit(" "), $"text")
      Tables.load(s, dir, "documents")
        .withColumn("raw", raw)
        .select($"doc_id",
          regexp_replace(
            regexp_replace($"raw", "[a-z0-9]+@[a-z.]+", "<EMAIL>"),
            "[0-9]{3}-[0-9]{4}", "<PHONE>").as("masked"),
          size(regexp_extract_all($"raw", lit("[a-z0-9]+@[a-z.]+"), lit(0)))
            .cast(LongType).as("n_emails"),
          size(regexp_extract_all($"raw", lit("[0-9]{3}-[0-9]{4}"), lit(0)))
            .cast(LongType).as("n_phones"))
        .orderBy($"doc_id")
    }),

    // Benchmark-contamination check: corpus docs sharing any word
    // 5-gram with the held-out benchmark set (source = src0).
    // Plan (r6, replaces the r3 corpus-wide window): the benchmark
    // side is distinct-reduced to its gram SET (benchmark corpora are
    // tiny next to the training corpus) and BROADCAST into a hash
    // left-semi join against the corpus grams; per-doc distinct-gram
    // hits then fold in one count_distinct aggregate. No sort and no
    // corpus-wide shuffle on the gram key — the only wide exchanges
    // left are the small bench-side distinct and the final per-doc
    // aggregate. At 100 TB the corpus side stays map-side until the
    // doc_id aggregate; the r3 window form instead sorted every corpus
    // gram inside gram partitions.
    "text_contamination" -> ((s, dir) =>
      contamHits(s, dir).orderBy(col("doc_id"))),

    // Decontamination APPLIED (r11d) — the action twin of
    // text_contamination (the dedup_apply pattern: detect → act →
    // audit). Docs whose benchmark 5-gram overlap reaches the
    // threshold are dropped; output is the per-source kept/dropped
    // audit a pipeline logs per shard. The hit relation is the same
    // broadcast-semi-join construction (session-cached — detection
    // and action consume one build); the apply step is one left join
    // + a two-phase aggregate, with the left join keyed on doc_id —
    // the hit relation is bounded by contaminated docs, far smaller
    // than the corpus at any scale.
    "text_decontaminate" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .filter($"source" =!= "src0")
        .select($"doc_id", $"source", $"n_chars")
        .join(contamHits(s, dir), Seq("doc_id"), "left")
        .withColumn("keep", coalesce($"n_hits" < 3, lit(true)))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
          sum(when(!$"keep", 1L).otherwise(0L)).as("n_dropped"),
          sum(when($"keep", $"n_chars")).as("kept_chars"))
        .orderBy($"source")
    }),

    // Equi-width histogram of order totals (bucket = 25k) with a
    // cumulative count — floor of one IEEE division, bit-identical
    // cross-engine. The cumulative window runs over the BUCKET table
    // (tens of rows), never the raw data.
    "agg_histogram" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .withColumn("bucket",
          floor($"o_totalprice" / 25000.0).cast(LongType))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"))
        .withColumn("lo", ($"bucket" * 25000L).cast(DoubleType))
        .withColumn("cum_n",
          sum($"n").over(Window.orderBy($"bucket")))
        .select($"bucket", $"lo", $"n", $"cum_n")
        .orderBy($"bucket")
    }),

    // Boolean aggregates: bool_and / bool_or / count_if per event type
    // (order-free folds over raw-double comparisons — no float summation).
    "agg_boolean" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          bool_and($"value" >= 0.0).as("all_nonneg"),
          bool_or($"value" > 99.0).as("any_big"),
          count_if($"value" > 50.0).as("n_big"))
        .orderBy($"event_type")
    }),

    // Fallible casts: try_cast yields NULL instead of failing the job —
    // the ingest-hardening primitive for dirty columns. Covers a
    // parseable suffix, a never-parseable string, a mixed column, and
    // a numeric overflow.
    "fn_trycast" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .withColumn("sfx", regexp_extract($"c_name", "([0-9]+)$", 1))
        .select($"c_custkey",
          expr("try_cast(sfx AS BIGINT)").as("suffix_n"),
          expr("try_cast(c_mktsegment AS BIGINT)").as("bad_n"),
          expr("try_cast(CASE WHEN c_custkey % 3 = 0 " +
            "THEN CAST(c_custkey AS STRING) ELSE c_name END AS BIGINT)")
            .as("mixed_n"),
          expr("CAST(try_cast(c_custkey AS TINYINT) AS BIGINT)")
            .as("small_n"))
        .orderBy($"c_custkey")
    }),

    // END-TO-END training-corpus pipeline — the composition a user of
    // this library actually runs: language filter → quality gate →
    // duplicate-cluster canonical filter → fixed-size chunking →
    // per-source corpus stats. Every stage is an operator verified on
    // its own elsewhere in the inventory; this key verifies the
    // COMPOSITION end to end against one closed-form oracle.
    "pipeline_corpus" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .filter($"lang" === "en")
        .withColumn("n_tok",
          size(split(lower($"text"), " ")).cast(LongType))
        .withColumn("n_types",
          size(array_distinct(split(lower($"text"), " "))).cast(LongType))
        // Quality gate: type-token ratio ≥ 0.5 and ≥ 10 tokens.
        .filter($"n_tok" >= 10L &&
          $"n_types" * 2L >= $"n_tok")
      // Drop non-canonical duplicates: docs labeled by a dup cluster
      // keep only the min-id representative; unclustered docs pass.
      val comp = DedupCluster.sharedComponents(s, dir)
      val canon = docs.join(comp, Seq("doc_id"), "left")
        .filter($"comp".isNull || $"comp" === $"doc_id")
      canon
        .withColumn("n_chunks",
          expr("CAST((length(text) - 1) div 150 + 1 AS BIGINT)"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
             sum($"n_chunks").as("n_chunks"),
             sum($"n_chars").as("total_chars"))
        .orderBy($"source")
    }),

    // Unpivot/melt: reduce first (3 groups), then melt the measure
    // columns into (metric, value) rows via Dataset.unpivot.
    "fn_unpivot" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          sum(expr("CAST(l_quantity AS DECIMAL(18,2))"))
            .cast(DoubleType).as("sum_qty"),
          sum(expr("CAST(l_extendedprice AS DECIMAL(18,2))"))
            .cast(DoubleType).as("sum_price"),
          count(lit(1)).cast(DoubleType).as("n_items"))
        .unpivot(Array($"l_returnflag"),
          Array($"sum_qty", $"sum_price", $"n_items"), "metric", "value")
        .orderBy($"l_returnflag", $"metric")
    }),

    // Unicode normalization-aware dedup (r6): each doc ships in two
    // variants — raw, and a deterministically "webbified" corruption
    // (combining accents instead of precomposed chars, NBSP/ZWSP/
    // double-space for spaces, trailing control chars). Naive exact
    // dedup sees 2N distinct texts; dedup on
    // TextNormalize.normalizeText (NFC → strip invisibles → collapse
    // whitespace → accent-fold, a codegen Expression chain) collapses
    // every pair, so n_copies = 2 and exactly the variant-0 row is the
    // keeper. All map-side except the dedup window itself, which
    // shuffles on the normalized-text key like dedup_exact.
    "text_normalize" -> ((s, dir) => {
      import s.implicits._
      graft.functions.TextNormalize.register(s)
      val junk = when(pmod($"doc_id", lit(3L)) === 0L, lit(" \u200B"))
        .when(pmod($"doc_id", lit(3L)) === 1L, lit("\u00A0"))
        .otherwise(lit("  "))
      val corrupted = concat(
        replace(replace($"text", lit("e"), lit("e\u0301")),
          lit(" "), junk),
        lit("\u0007\t"))
      val variants = Tables.load(s, dir, "documents")
        .select($"doc_id", explode(array(
          struct(lit(0L).as("variant"), $"text".as("vtext")),
          struct(lit(1L).as("variant"), corrupted.as("vtext")))).as("v"))
        .select($"doc_id", $"v.variant".as("variant"),
          graft.functions.TextNormalize.normalizeText($"v.vtext").as("norm"))
      val byNorm = Window.partitionBy($"norm")
      val byNormOrd = byNorm.orderBy($"doc_id", $"variant")
      variants.select($"doc_id", $"variant",
          length($"norm").cast(LongType).as("norm_len"),
          md5($"norm").as("norm_md5"),
          count(lit(1)).over(byNorm).as("n_copies"),
          (row_number().over(byNormOrd) === 1).as("keeper"))
        .orderBy($"doc_id", $"variant")
    }),

    // Sequence packing (r6) — the step that turns a cleaned corpus
    // into fixed-token-budget training sequences: documents are
    // concatenated in a deterministic order and cut every 256 tokens
    // ("concat and chunk", the standard LLM pretraining packing).
    // Each doc reports its global token offset, first/last pack id,
    // and how many sequence boundaries it spans. Packing is per
    // SOURCE (the shard key): a running token sum over a per-source
    // window — at 100 TB the same plan packs per (source, shard)
    // with a deterministic affine shard key, embarrassingly parallel
    // across shards, and the window state is O(1) per row.
    "text_pack" -> ((s, dir) => {
      import s.implicits._
      val B = 256L
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      Tables.load(s, dir, "documents")
        .withColumn("n_tok",
          size(filter(split(lower($"text"), " "), t => t =!= ""))
            .cast(LongType))
        .withColumn("end_off", sum($"n_tok").over(w))
        .withColumn("start_off", $"end_off" - $"n_tok")
        .select($"doc_id", $"source", $"n_tok", $"start_off",
          expr(s"start_off div $B").as("pack_first"),
          // Empty docs occupy no tokens: they "land" at their start
          // boundary and span exactly their first pack.
          when($"n_tok" === 0L, expr(s"start_off div $B"))
            .otherwise(expr(s"(end_off - 1) div $B")).as("pack_last"))
        .withColumn("n_spans", $"pack_last" - $"pack_first" + 1L)
        .orderBy($"doc_id")
    }))

  def oracle: Seq[(String, String)] = Seq(
    "text_chunk" ->
      """SELECT doc_id,
        |  (start - 1) // 150 + 1 AS chunk_id,
        |  CAST(start AS BIGINT) AS start,
        |  CAST(len(substring(text, start, 200)) AS BIGINT) AS chunk_len,
        |  substring(text, start, 200) AS chunk
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(1, len(text), 150)) AS start
        |      FROM documents) t
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "sample_stratified" ->
      """SELECT lang,
        |  CASE WHEN h < 800 THEN 'train' WHEN h < 900 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM (SELECT lang, doc_id,
        |        (doc_id * 2654435761 + 40503) % 1000 AS h
        |      FROM documents) t
        |GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    "text_pii" ->
      """WITH r AS (SELECT doc_id,
        |    'contact u' || CAST(doc_id AS VARCHAR) || '@ex.org ph 555-01'
        |      || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' ' || text
        |      AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(raw, '[a-z0-9]+@[a-z.]+', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS masked,
        |  CAST(len(regexp_extract_all(raw, '[a-z0-9]+@[a-z.]+'))
        |    AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{4}'))
        |    AS BIGINT) AS n_phones
        |FROM r ORDER BY doc_id""".stripMargin,

    "text_contamination" ->
      """WITH d AS (SELECT doc_id, source,
        |    string_split(lower(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, source, unnest(
        |    CASE WHEN len(toks) < 5 THEN CAST([] AS VARCHAR[])
        |    ELSE list_transform(generate_series(1, len(toks) - 4),
        |      i -> array_to_string(list_slice(toks, i, i + 4), ' ')) END)
        |    AS gram FROM d),
        |bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |corp AS (SELECT DISTINCT doc_id, gram FROM g
        |         WHERE source <> 'src0')
        |SELECT doc_id, count(*) AS n_hits
        |FROM corp JOIN bench USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_decontaminate" ->
      """WITH d AS (SELECT doc_id, source,
        |    string_split(lower(text), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, source, unnest(
        |    CASE WHEN len(toks) < 5 THEN CAST([] AS VARCHAR[])
        |    ELSE list_transform(generate_series(1, len(toks) - 4),
        |      i -> array_to_string(list_slice(toks, i, i + 4), ' ')) END)
        |    AS gram FROM d),
        |bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |corp AS (SELECT DISTINCT doc_id, gram FROM g
        |         WHERE source <> 'src0'),
        |hits AS (SELECT doc_id, count(*) AS n_hits
        |  FROM corp JOIN bench USING (gram) GROUP BY doc_id),
        |app AS (SELECT dd.source, dd.n_chars,
        |    COALESCE(h.n_hits < 3, TRUE) AS keep
        |  FROM documents dd LEFT JOIN hits h ON dd.doc_id = h.doc_id
        |  WHERE dd.source <> 'src0')
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  CAST(sum(CASE WHEN keep THEN n_chars END) AS BIGINT)
        |    AS kept_chars
        |FROM app GROUP BY source ORDER BY source""".stripMargin,

    "agg_histogram" ->
      """SELECT bucket, CAST(bucket * 25000 AS DOUBLE) AS lo,
        |  count(*) AS n,
        |  CAST(sum(count(*)) OVER (ORDER BY bucket) AS BIGINT) AS cum_n
        |FROM (SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT)
        |        AS bucket FROM orders) t
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "agg_boolean" ->
      """SELECT event_type, count(*) AS n,
        |  bool_and(value >= 0.0) AS all_nonneg,
        |  bool_or(value > 99.0) AS any_big,
        |  count(*) FILTER (WHERE value > 50.0) AS n_big
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "fn_trycast" ->
      """SELECT c_custkey,
        |  TRY_CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)
        |    AS suffix_n,
        |  TRY_CAST(c_mktsegment AS BIGINT) AS bad_n,
        |  TRY_CAST(CASE WHEN c_custkey % 3 = 0
        |    THEN CAST(c_custkey AS VARCHAR) ELSE c_name END AS BIGINT)
        |    AS mixed_n,
        |  CAST(TRY_CAST(c_custkey AS TINYINT) AS BIGINT) AS small_n
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "pipeline_corpus" ->
      s"""WITH
        |${DedupCluster.edgeBiSql},
        |${DedupCluster.closureSql()},
        |comp AS (SELECT n AS doc_id, l AS comp
        |         FROM ${DedupCluster.closureFinalCte()}),
        |docs AS (SELECT doc_id, source, n_chars, text,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(string_split(lower(text), ' ')))
        |      AS BIGINT) AS n_types
        |  FROM documents WHERE lang = 'en'),
        |q AS (SELECT * FROM docs
        |      WHERE n_tok >= 10 AND n_types * 2 >= n_tok),
        |canon AS (SELECT q.* FROM q
        |  LEFT JOIN comp ON comp.doc_id = q.doc_id
        |  WHERE comp.comp IS NULL OR comp.comp = q.doc_id)
        |SELECT source, count(*) AS n_docs,
        |  CAST(SUM((len(text) - 1) // 150 + 1) AS BIGINT) AS n_chunks,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM canon GROUP BY source ORDER BY source""".stripMargin,

    "fn_unpivot" ->
      """WITH a AS (SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_price,
        |    CAST(count(*) AS DOUBLE) AS n_items
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', sum_price FROM a
        |UNION ALL
        |SELECT l_returnflag, 'n_items', n_items FROM a
        |ORDER BY l_returnflag, metric""".stripMargin,

    // Same corruption (chr codes: 769 = U+0301 combining acute,
    // 8203 = ZWSP, 160 = NBSP, 7 = BEL, 9 = TAB) and the same
    // normalize chain; DuckDB's strip_accents stands in for the
    // NFD + strip-combining-marks fold (equivalent on Latin input).
    "text_normalize" ->
      """WITH c AS (SELECT doc_id, text,
        |    replace(replace(text, 'e', 'e' || chr(769)), ' ',
        |      CASE WHEN doc_id % 3 = 0 THEN ' ' || chr(8203)
        |           WHEN doc_id % 3 = 1 THEN chr(160)
        |           ELSE '  ' END) || chr(7) || chr(9) AS corrupted
        |  FROM documents),
        |v AS (SELECT doc_id, CAST(0 AS BIGINT) AS variant, text AS vtext
        |        FROM c
        |      UNION ALL
        |      SELECT doc_id, 1, corrupted FROM c),
        |n AS (SELECT doc_id, variant,
        |    strip_accents(trim(regexp_replace(regexp_replace(
        |      nfc_normalize(vtext),
        |      '[\x{200B}\x{200C}\x{200D}\x{2060}\x{FEFF}]', '', 'g'),
        |      '[\p{Cc}\p{Z}\s]+', ' ', 'g'))) AS norm
        |  FROM v)
        |SELECT doc_id, variant,
        |  CAST(len(norm) AS BIGINT) AS norm_len,
        |  md5(norm) AS norm_md5,
        |  count(*) OVER (PARTITION BY norm) AS n_copies,
        |  row_number() OVER (PARTITION BY norm
        |                     ORDER BY doc_id, variant) = 1 AS keeper
        |FROM n ORDER BY doc_id, variant""".stripMargin,

    // Windowed sum of token counts goes HUGEINT in DuckDB — CAST back
    // before the integer divisions.
    "text_pack" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      t -> t <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
        |      AS BIGINT) AS end_off
        |  FROM d)
        |SELECT doc_id, source, n_tok,
        |  end_off - n_tok AS start_off,
        |  (end_off - n_tok) // 256 AS pack_first,
        |  CASE WHEN n_tok = 0 THEN (end_off - n_tok) // 256
        |       ELSE (end_off - 1) // 256 END AS pack_last,
        |  (CASE WHEN n_tok = 0 THEN (end_off - n_tok) // 256
        |        ELSE (end_off - 1) // 256 END)
        |    - (end_off - n_tok) // 256 + 1 AS n_spans
        |FROM c ORDER BY doc_id""".stripMargin)
}
