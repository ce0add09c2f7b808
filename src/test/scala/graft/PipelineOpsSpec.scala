package graft

import org.apache.spark.sql.functions._

/** Laws for the §2.M pipeline utilities, run on sf0.001 fixtures. */
class PipelineOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def q(key: String) =
    SparkEntry.queries(key)(spark, sf)

  test("text_chunk: chunks reconstruct the document and respect bounds") {
    val chunks = q("text_chunk").cache()
    val docs = Tables.load(spark, sf, "documents")
    // Every doc chunked; stride 150 with chunk 200 ⇒ dropping the
    // 50-char overlap from every chunk after the first reconstructs
    // the original text exactly.
    val rebuilt = chunks
      .withColumn("piece",
        when($"chunk_id" === 1, $"chunk")
          .otherwise(expr("substring(chunk, 51, 200)")))
      .groupBy($"doc_id")
      .agg(concat_ws("", sort_array(collect_list(
        struct($"chunk_id", $"piece"))).getField("piece")).as("text"))
    assertSameRows(rebuilt,
      docs.select($"doc_id", $"text"), "chunk reconstruction")
    assert(chunks.filter($"chunk_len" > 200 || $"chunk_len" < 1)
      .count() == 0, "chunk length bounds")
    chunks.unpersist()
  }

  test("sample_stratified: splits partition the corpus and are stable") {
    val s1 = q("sample_stratified")
    assert(s1.agg(sum($"n")).head().getLong(0) ==
      Tables.load(spark, sf, "documents").count(),
      "split sizes sum to corpus size")
    // Pure hash ⇒ a second evaluation is identical.
    assertSameRows(q("sample_stratified"), s1, "determinism")
  }

  test("text_pii: no email/phone pattern survives masking") {
    val m = q("text_pii").cache()
    assert(m.filter($"masked".rlike("[a-z0-9]+@[a-z.]+")).count() == 0,
      "emails masked")
    assert(m.filter($"masked".rlike("[0-9]{3}-[0-9]{4}")).count() == 0,
      "phones masked")
    assert(m.filter($"n_emails" < 1 || $"n_phones" < 1).count() == 0,
      "every synthesized row had at least one email and phone")
    m.unpersist()
  }

  test("agg_histogram: buckets partition the table; cumulative is total") {
    val h = q("agg_histogram").cache()
    val total = Tables.load(spark, sf, "orders").count()
    assert(h.agg(sum($"n")).head().getLong(0) == total)
    assert(h.orderBy($"bucket".desc).select($"cum_n").head()
      .getLong(0) == total)
    h.unpersist()
  }

  test("fn_unpivot: melt emits one row per (group, measure)") {
    val m = q("fn_unpivot")
    val groups = Tables.load(spark, sf, "lineitem")
      .select($"l_returnflag").distinct().count()
    assert(m.count() == groups * 3)
  }

  test("fn_trycast: failed casts are NULL, suffix casts all parse") {
    val t = q("fn_trycast").cache()
    assert(t.filter($"bad_n".isNotNull).count() == 0, "bad casts NULL")
    assert(t.filter($"suffix_n".isNull).count() == 0, "suffixes parse")
    // Mixed column parses exactly the custkey%3==0 rows.
    assert(t.filter($"mixed_n".isNotNull).count() ==
      t.filter($"c_custkey" % 3 === 0).count())
    t.unpersist()
  }

  test("text_contamination: benchmark-vs-benchmark flags every 5-gram doc") {
    // Self-check of the gram machinery: a doc shares all its own grams.
    val d = Tables.load(spark, sf, "documents")
      .withColumn("toks", split(lower($"text"), " "))
      .withColumn("grams", expr(
        "CASE WHEN size(toks) < 5 THEN array() " +
          "ELSE transform(sequence(1, size(toks) - 4), " +
          "i -> array_join(slice(toks, i, 5), ' ')) END"))
    val g = d.select($"doc_id", explode($"grams").as("gram")).distinct()
    val hits = g.join(g.select($"gram").distinct(), Seq("gram"), "left_semi")
      .select($"doc_id").distinct().count()
    assert(hits == d.filter(size($"toks") >= 5).count())
  }
}
