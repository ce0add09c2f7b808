package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2.A — scans / sources / sinks (SURVEY.md §2.A).
  *
  * Round-trip keys (`source_csv`, `source_json`, `sink_parquet_part`)
  * write a table to `target/roundtrip/` in the exercised format and
  * read it back through an explicit schema; because the trip is
  * lossless for the projected columns, the oracle SQL computes the
  * same result straight from the parquet view. The write happens on
  * every invocation (overwrite mode) — deliberately, so the sink path
  * is actually exercised by verify AND bench, not just once.
  *
  * Scale notes (100 TB):
  * - `scan_parquet`/`scan_pruned` are the pushdown proof points: the
  *   physical scan must show PushedFilters + a pruned ReadSchema
  *   (asserted in PlanShapeSpec). Count/sum aggregate two-phase with
  *   no wide shuffle.
  * - `sink_parquet_part` partitions by a low-cardinality column
  *   (5 event types) — the layout that enables partition pruning on
  *   read-back. At real scale you'd add a second time-bucket partition
  *   key and size files via maxRecordsPerFile; the read-back groupBy
  *   aggregates partially within each partition before one 5-key
  *   shuffle.
  */
object SourceSinkQueries extends QueryPack {
  import Det._

  /** Per-sf-dir scratch dir inside the repo's target/ (never touches
    * the read-only testdata). */
  private def tmp(dir: String, leaf: String): String = {
    val sf = new java.io.File(dir).getName
    s"target/roundtrip/${sf}_$leaf"
  }

  /** Paths staged THIS JVM (scan_dpp writes once per process). */
  private val dppStaged = scala.collection.mutable.Set[String]()

  /** Per-(jvm, dir) memo for scan_bloom_idx: the two staged layouts
    * plus the probe keys (lo, mid, hi) read off the table once at
    * staging time (a staging bound, the EventStreams.scala precedent
    * — never a per-run collect in the query path). */
  private val bloomStaged =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long, Long)]

  /** scan_bloom_idx staging (r16 verdict item 3) — the STORAGE half of
    * "never read the corpus", below the planner features scan_dpp /
    * join_bloom already prove. Two physical layouts of orders, both
    * probed by the same 3-key point lookup:
    *
    *  - `scatter`: rows hash-scattered by o_custkey into 8 files, so
    *    every file's o_orderkey [min,max] spans the whole key range
    *    and ROW-GROUP STATS CANNOT PRUNE ANYTHING — then a write-side
    *    BLOOM FILTER on o_orderkey (`parquet.bloom.filter.enabled`)
    *    is the only thing standing between a point lookup and a full
    *    scan: the reader tests each row group's bloom and skips the
    *    ~5/8 files that cannot contain any probed key. This is the
    *    unsorted-fact-table reality of most 100-TB corpora (clustered
    *    by arrival, probed by id).
    *  - `sorted`: rows range-partitioned + sorted by o_orderkey into
    *    8 files with small pages (`parquet.page.row.count.limit` =
    *    100), so the PAGE-LEVEL COLUMN INDEX (parquet offset/column
    *    indexes, written by default since parquet-mr 1.11) prunes the
    *    lookup to the ~1 page per key that can match — row-group
    *    stats prune files, the column index prunes WITHIN the
    *    surviving ones. This is the compacted/Z-ordered layout.
    *
    * Both skips happen in the parquet READER at runtime, invisible to
    * plan shape — a silently-disabled bloom/column-index still
    * returns correct rows while reading 8x the bytes (exactly the
    * DPP-degradation class r16 caught) — so R17OpsSpec pins the scan
    * operator's RUNTIME numOutputRows against an independently
    * computed expectation for both layouts. Probe keys are (min,
    * (min+max) div 2, max): the mid key may or may not exist —
    * deterministic either way, and the oracle computes the same three
    * via scalar subqueries. Staged once per (jvm, dir); the probe is
    * the repeated operation, the write is the index build (cold-
    * column accounting like every written index). */
  private[graft] def stageBloomIdx(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : (String, String, Seq[Long]) = {
    val scatter = tmp(dir, "orders_bloom_scatter")
    val sorted = tmp(dir, "orders_colidx_sorted")
    val (lo, mid, hi) = bloomStaged.getOrElseUpdate(dir, {
      val o = Tables.load(s, dir, "orders")
      val r = o.agg(min(col("o_orderkey")), max(col("o_orderkey"))).head()
      val (l, h) = (r.getLong(0), r.getLong(1))
      o.repartition(8, col("o_custkey"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#o_orderkey", "true")
        // NDV sized for the 100x staging's ~1.9M distinct keys per
        // row group (an undersized bloom saturates and silently stops
        // skipping — correctness unaffected, which is exactly why the
        // runtime metrics law exists); parquet-mr caps bloom bytes at
        // 1 MB by default, so the cap is raised to let the 1%-FPP
        // size (~2.4 MB at 2M NDV) actually materialize. At small SFs
        // the bloom is oversized, never undersized — the safe side.
        .option("parquet.bloom.filter.expected.ndv#o_orderkey", "2000000")
        .option("parquet.bloom.filter.max.bytes", "4194304")
        // Plain encoding, no dictionaries: the scenario being modeled
        // is the high-NDV id column whose dictionary overflows to
        // plain at real scale — and parquet-mr omits the bloom
        // entirely for a fully-dictionary-encoded column (the
        // dictionary already answers membership), so at fixture scale
        // the bloom only EXISTS with dictionaries off. Also what
        // makes the R17OpsSpec control attribution clean: with no
        // dictionary and useless min/max stats, the bloom is the ONLY
        // possible row-group skip on this layout.
        .option("parquet.enable.dictionary", "false")
        .parquet(scatter)
      o.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "100")
        .parquet(sorted)
      (l, (l + h) / 2, h)
    })
    (scatter, sorted, Seq(lo, mid, hi))
  }

  def queries: Seq[(String, Q)] = Seq(
    // Full parquet scan: count + exact decimal sum over lineitem.
    "scan_parquet" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("sum_price"))
    }),

    // Hidden file-metadata columns (r8): `_metadata.file_path` /
    // `file_size` / `row_index` are the lineage surface a 100-TB
    // pipeline debugs with (which file produced this row, without a
    // re-listing join). The oracle can't see Spark's metadata struct,
    // so the output is layout-independent: row accounting must agree
    // with a plain scan, and every row must carry a non-empty path and
    // positive size (all_paths/all_sized booleans) — proving the
    // plumbing populates per-row, not that the fixture has N files.
    "scan_metadata" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .select($"event_id",
          col("_metadata.file_path").as("fp"),
          col("_metadata.file_size").as("fs"))
        .agg(count(lit(1)).as("n_rows"),
          min($"event_id").as("min_id"), max($"event_id").as("max_id"),
          min($"fp".isNotNull && length($"fp") > 0).as("all_paths"),
          min($"fs" > 0L).as("all_sized"))
    }),

    // Projection + predicate pushdown: 3 columns, pushable filter.
    // PlanShapeSpec asserts PushedFilters + pruned ReadSchema.
    "scan_pruned" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .where($"l_extendedprice" > 90000.0)
        // (l_orderkey, l_linenumber) is NOT unique in the fixtures —
        // include the remaining output column for a total sort.
        .orderBy($"l_orderkey", $"l_linenumber", $"l_extendedprice")
    }),

    // Time-range scan over events with the predicate PUSHED to parquet
    // (r7): the range is phrased on the raw column in its native
    // fixture type (long ns / NTZ timestamp) before the canonicalizing
    // projection (Tables.loadEventsBetween), so row-group min/max
    // stats prune — PlanShapeSpec asserts the PushedFilters. At 100 TB
    // this is the difference between scanning a day and a year.
    "scan_time_range" -> ((s, dir) => {
      import s.implicits._
      Tables.loadEventsBetween(s, dir,
          "2024-01-16T00:00:00Z", "2024-01-18T00:00:00Z")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value").as("sum_v"))
        .orderBy($"event_type")
    }),

    // CSV round-trip of region with explicit schema (no inference).
    "source_csv" -> ((s, dir) => {
      import s.implicits._
      val path = tmp(dir, "region_csv")
      Tables.load(s, dir, "region")
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read.schema(Tables.region).option("header", "true").csv(path)
        .orderBy($"r_regionkey")
    }),

    // Plain-text source (spark.read.text) — the line-oriented format
    // raw web corpora land in first. doc_id TAB text lines round-trip
    // through a text file and are re-split map-side on read (fixture
    // text is tab/newline-free, asserted by the oracle hash-match
    // against the original table). Scale: text files split by line
    // ranges exactly like CSV; the parse is a narrow projection.
    "source_text" -> ((s, dir) => {
      import s.implicits._
      val path = tmp(dir, "documents_text")
      Tables.load(s, dir, "documents")
        .select(concat_ws("\t", $"doc_id", $"text").as("value"))
        .write.mode("overwrite").text(path)
      s.read.text(path)
        .select(
          split($"value", "\t").getItem(0).cast(LongType).as("doc_id"),
          split($"value", "\t").getItem(1).as("text"))
        .orderBy($"doc_id")
    }),

    // JSON-lines round-trip of nation with explicit schema.
    "source_json" -> ((s, dir) => {
      import s.implicits._
      val path = tmp(dir, "nation_json")
      Tables.load(s, dir, "nation")
        .write.mode("overwrite").json(path)
      s.read.schema(Tables.nation).json(path)
        .orderBy($"n_nationkey")
    }),

    // ORC round-trip of supplier (Spark's second built-in columnar
    // format): lossless for these types, so the oracle reads the
    // parquet view directly. The write is staged once per JVM (r8,
    // verdict item 3): r7 measured the write+read form regressing
    // 2.2x on staging-I/O variance alone, and the operator under test
    // is the ORC READER — csv/json/text keep their per-run writes so
    // a sink path stays exercised every bench run.
    "source_orc" -> ((s, dir) => {
      import s.implicits._
      val path = tmp(dir, "supplier_orc")
      dppStaged.synchronized {
        if (!dppStaged.contains(path)) {
          Tables.load(s, dir, "supplier")
            .write.mode("overwrite").orc(path)
          dppStaged += path
        }
      }
      s.read.schema(Tables.supplier).orc(path)
        .select($"s_suppkey", $"s_name", $"s_nationkey",
                money($"s_acctbal").cast(DoubleType).as("acctbal"))
        .orderBy($"s_suppkey")
    }),

    // Avro Object Container File source (r13; r11/r12 verdict item:
    // adjudicate Avro — the genre's Kafka→HDFS landing format). The
    // environment has no spark-avro DataSource module (absent from
    // /opt/spark/jars and the offline coursier cache; zero egress),
    // but Avro CORE (avro-1.12.1) ships on the Spark classpath, so
    // the format gets a REAL distributed reader instead of a blocked
    // row: binaryFile ingest — one row per container file, the
    // natural shard unit a fleet of Kafka consumers lands — then a
    // per-file DataFileReader decode in a flatMap. Read parallelism =
    // #files, exactly how a landing zone scales (consumers roll files
    // by size/time); a single multi-GB container file would instead
    // go through the sync-marker-splitting avro-mapred InputFormat
    // (also on the classpath) — not the landing-zone shape, so not
    // the default path. Staging (test fixture only, once per JVM like
    // source_orc): nation written distributed via DataFileWriter, one
    // container file per partition. Types are lossless, so the oracle
    // reads the parquet table directly.
    "source_avro" -> ((s, dir) => {
      import s.implicits._
      val path = tmp(dir, "nation_avro")
      val schemaJson = """{"type":"record","name":"nation","fields":[
        {"name":"n_nationkey","type":"int"},
        {"name":"n_name","type":"string"},
        {"name":"n_regionkey","type":"int"}]}"""
      dppStaged.synchronized {
        if (!dppStaged.contains(path)) {
          val root = new java.io.File(path)
          graft.Util.deleteRecursively(root)
          root.mkdirs()
          Tables.load(s, dir, "nation")
            .select($"n_nationkey", $"n_name", $"n_regionkey")
            .as[(Int, String, Int)]
            .repartition(4)
            .foreachPartition { (it: Iterator[(Int, String, Int)]) =>
              if (it.hasNext) {
                val sch =
                  new org.apache.avro.Schema.Parser().parse(schemaJson)
                val w = new org.apache.avro.file.DataFileWriter(
                  new org.apache.avro.generic.GenericDatumWriter[
                    org.apache.avro.generic.GenericRecord](sch))
                val pid = org.apache.spark.TaskContext.getPartitionId()
                w.create(sch,
                  new java.io.File(path, f"part-$pid%05d.avro"))
                try it.foreach { case (k, nm, rk) =>
                  val r =
                    new org.apache.avro.generic.GenericData.Record(sch)
                  r.put("n_nationkey", k)
                  r.put("n_name", nm)
                  r.put("n_regionkey", rk)
                  w.append(r)
                } finally w.close()
              }
            }
          dppStaged += path
        }
      }
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro").load(path)
        .select($"content").as[Array[Byte]]
        .flatMap { bytes =>
          val rdr = new org.apache.avro.file.DataFileReader(
            new org.apache.avro.file.SeekableByteArrayInput(bytes),
            new org.apache.avro.generic.GenericDatumReader[
              org.apache.avro.generic.GenericRecord]())
          try {
            val out = Seq.newBuilder[(Int, String, Int)]
            while (rdr.hasNext) {
              val r = rdr.next()
              out += ((r.get("n_nationkey").asInstanceOf[Int],
                r.get("n_name").toString,
                r.get("n_regionkey").asInstanceOf[Int]))
            }
            out.result()
          } finally rdr.close()
        }
        .toDF("n_nationkey", "n_name", "n_regionkey")
        .orderBy($"n_nationkey")
    }),

    // Corrupt-record ingest: every real JSON pipeline sees malformed
    // lines. Synthesizes a JSON-lines file from nation with every 5th
    // key replaced by an unparseable line (deterministic, so the
    // oracle reproduces the good/bad split from the parquet table by
    // the same rule), reads it back PERMISSIVE with a
    // `_corrupt_record` column, and reports the triage counts a real
    // ingest job would: total / parsed / corrupt, a checksum over the
    // parsed keys, and the lexicographic-min corrupt sample. At scale
    // this is one pass + a global two-phase aggregate — quarantining
    // the corrupt rows themselves would be the same scan writing two
    // filtered branches.
    "source_json_corrupt" -> ((s, dir) => {
      import s.implicits._
      val path = tmp(dir, "nation_corrupt_json")
      Tables.load(s, dir, "nation")
        .select(when($"n_nationkey" % 5 === 0,
            concat(lit("{corrupt "), $"n_name", lit(" #"), $"n_nationkey"))
          .otherwise(to_json(struct($"n_nationkey", $"n_name",
            $"n_regionkey")))
          .as("value"))
        .write.mode("overwrite").text(path)
      s.read.schema(Tables.nation.add("_corrupt_record", StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .agg(
          count(lit(1)).as("n_rows"),
          count($"n_nationkey").as("n_good"),
          count($"_corrupt_record").as("n_corrupt"),
          sum(when($"_corrupt_record".isNull, $"n_nationkey"))
            .as("sum_good_keys"),
          min($"_corrupt_record").as("corrupt_sample"))
    }),

    // Malformed-CSV ingest (sibling of source_json_corrupt): every
    // 7th supplier line is written with a wrong column count and a
    // non-numeric key; PERMISSIVE parsing must null the fields, stash
    // the raw line in _corrupt_record, and keep every good row — the
    // quarantine-don't-abort semantics a 100-TB ingest needs (one bad
    // line must never kill a 10^9-line load).
    "source_csv_malformed" -> ((s, dir) => {
      import s.implicits._
      val path = tmp(dir, "supplier_malformed_csv")
      Tables.load(s, dir, "supplier")
        .select(when($"s_suppkey" % 7 === 0,
            concat(lit("not_a_number,"), $"s_name", lit(",oops")))
          .otherwise(concat_ws(",", $"s_suppkey", $"s_name",
            $"s_nationkey", $"s_acctbal"))
          .as("value"))
        .write.mode("overwrite").text(path)
      s.read.schema(Tables.supplier.add("_corrupt_record", StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .agg(
          count(lit(1)).as("n_rows"),
          count($"s_suppkey").as("n_good"),
          count($"_corrupt_record").as("n_corrupt"),
          sum(when($"_corrupt_record".isNull, $"s_suppkey"))
            .as("sum_good_keys"))
    }),

    // Partitioned parquet sink: write events partitioned by
    // event_type, read back, aggregate per partition value.
    "sink_parquet_part" -> ((s, dir) => {
      import s.implicits._
      val path = tmp(dir, "events_part")
      Tables.load(s, dir, "events")
        .write.mode("overwrite").partitionBy("event_type").parquet(path)
      s.read.parquet(path)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             dsum($"value").as("sum_v"),
             min($"event_id").as("min_id"),
             max($"event_id").as("max_id"))
        .orderBy($"event_type")
    }),

    // Small-file compaction PLANNER (r11d): assign items to target-
    // sized output files by greedy in-order bin packing — the
    // OPTIMIZE/rewrite-data-files planning step every table format
    // runs against a manifest. bin = floor(exclusive-prefix-sum of
    // bytes / target): pure integer arithmetic over one per-source
    // running-sum window, so the plan is deterministic and every bin
    // except the last of a source lands in [target, target + max
    // item) bytes (law in R11dOpsSpec). Per-source windows are the
    // scale shape: a 100-TB table's compaction planner sorts FILE
    // MANIFEST rows (thousands per partition), never data — the
    // window input here is metadata-sized by construction, and
    // distinct sources plan in parallel.
    "sink_compaction_plan" -> ((s, dir) => {
      import s.implicits._
      val target = 2000L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      Tables.load(s, dir, "documents")
        .select($"source", $"doc_id", $"n_chars")
        .withColumn("prior", coalesce(sum($"n_chars").over(w), lit(0L)))
        .withColumn("bin", expr(s"prior div ${target}L"))
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("bin_chars"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"source", $"bin")
    }),

    // Bucketed-table sink + exchange-free join (r11c): the storage
    // layout decision that deletes the biggest shuffle a warehouse
    // has — both fact tables are written `bucketBy(8, orderkey)` +
    // sortBy, so the SortMergeJoin consumes the bucket layout
    // directly and the ONLY exchange in the plan is the 3-row final
    // aggregate (pinned in R11cOpsSpec; UdfAndBucketingSpec proved
    // the shape, this key makes it an oracled, benched artifact).
    // The bucketed write is an index artifact: staged once per
    // (session, dir) under the SessionCache memo, so bench passes
    // probe the layout and the cold column carries the write — the
    // same accounting as every other build-once-probe-many relation.
    // At 100 TB this IS how the nightly fact⋈fact join is scheduled
    // (Hive/Iceberg bucket transforms); the oracle is the plain join.
    "sink_bucketed" -> ((s, dir) => {
      import s.implicits._
      // r16 (ADVICE): full dirTag discipline — basename alone leaves
      // the 'sf0.01' vs 'sf0_01' table-name collision live.
      val tag = graft.Util.dirTag(dir)
      graft.SessionCache.cached(s, s"bucketed:$dir", persist = false) {
        val wh = tmp(dir, "bucketed")
        s.sql(s"DROP TABLE IF EXISTS li_bk_$tag")
        s.sql(s"DROP TABLE IF EXISTS ord_bk_$tag")
        Tables.load(s, dir, "lineitem")
          .select($"l_orderkey", $"l_extendedprice")
          .write.mode("overwrite").option("path", s"$wh/li")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(s"li_bk_$tag")
        Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_orderstatus")
          .write.mode("overwrite").option("path", s"$wh/ord")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(s"ord_bk_$tag")
        s.range(1).toDF() // memo token: the artifact is the tables
      }
      s.table(s"li_bk_$tag")
        .join(s.table(s"ord_bk_$tag").hint("merge"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          dsum($"l_extendedprice").as("sum_price"))
        .orderBy($"o_orderstatus")
    }),

    // binaryFile source (r7): the REAL multimodal ingest path — images
    // / audio / video land as one opaque file each, and
    // `format("binaryFile")` reads them as (path, modTime, length,
    // content) rows without any codec. Staged one-file-per-doc from a
    // 20-doc subset (executor-side foreach write — no driver collect;
    // at scale the files come from object storage and this staging
    // step doesn't exist). The oracle recomputes (fname, n_bytes,
    // digest) from the documents table, so a hash match proves the
    // binary round-trip is byte-exact.
    "source_binaryfile" -> ((s, dir) => {
      import s.implicits._
      val path = tmp(dir, "blobs")
      dppStaged.synchronized {
        if (!dppStaged.contains(path)) {
          graft.Util.deleteRecursively(new java.io.File(path))
          new java.io.File(path).mkdirs()
          Tables.load(s, dir, "documents").filter($"doc_id" < 20)
            .select($"doc_id", $"text").foreach { r =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(path, s"doc_${r.getLong(0)}.txt"),
                r.getString(1).getBytes(
                  java.nio.charset.StandardCharsets.UTF_8))
              ()
            }
          dppStaged += path
        }
      }
      s.read.format("binaryFile").load(s"$path/*.txt")
        .select(regexp_extract($"path", "([^/]+)$", 1).as("fname"),
          $"length".as("n_bytes"), md5($"content").as("digest"))
        .orderBy($"fname")
    }),

    // Dynamic partition pruning (r7): THE optimizer feature that makes
    // star joins over partitioned 100-TB fact tables viable — the
    // selective dim-side predicate turns into a runtime IN-filter on
    // the fact's PARTITION column, so only matching partition
    // directories are listed/scanned (here 2 of 5). The fact is a
    // staged orders copy partitioned by o_orderpriority; the dim is
    // the distinct priority list filtered to '1-%'/'2-%'. The plan
    // must carry `dynamicpruning` in the scan's PartitionFilters —
    // pinned in PlanShapeSpec, because a silently-disabled DPP still
    // returns correct rows while scanning 2.5× the data.
    "scan_dpp" -> ((s, dir) => {
      import s.implicits._
      val path = tmp(dir, "orders_bypriority")
      val o = Tables.load(s, dir, "orders")
      // Stage once per JVM (bench runs the key 3×), but NEVER trust a
      // copy from an earlier process: an on-disk _SUCCESS guard would
      // go stale if the source fixture were regenerated between runs.
      dppStaged.synchronized {
        if (!dppStaged.contains(path)) {
          o.write.mode("overwrite").partitionBy("o_orderpriority")
            .parquet(path)
          dppStaged += path
        }
      }
      val fact = s.read.parquet(path)
      val dim = o.select($"o_orderpriority".as("pri")).distinct()
        .filter($"pri".startsWith("1-") || $"pri".startsWith("2-"))
      fact.join(dim, $"o_orderpriority" === $"pri")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
        .orderBy($"o_orderpriority")
    }),

    // Parquet write-side bloom filter + page-level column index
    // (r17, verdict item 3) — full design note at stageBloomIdx. The
    // key itself is the probe: the SAME 3-key point lookup against
    // both staged layouts, reduced to per-layout accounting. The
    // IN-list is literal at planning time (staging-bound keys), so it
    // reaches the parquet reader as a pushed filter and the bloom /
    // column-index skips actually engage — runtime-metrics law in
    // R17OpsSpec; the oracle is the same lookup on the plain table
    // (layout is pure execution strategy, the join_skew_salted
    // discipline).
    "scan_bloom_idx" -> ((s, dir) => {
      import s.implicits._
      val (scatter, sorted, keys) = stageBloomIdx(s, dir)
      def probe(path: String, layout: String) =
        s.read.parquet(path)
          .filter($"o_orderkey".isin(keys: _*))
          .agg(count(lit(1)).as("n"),
            countDistinct($"o_orderkey").as("n_keys"),
            dsum($"o_totalprice").as("sum_price"))
          .select(lit(layout).as("layout"), $"n", $"n_keys", $"sum_price")
      probe(scatter, "bloom_scatter")
        .unionAll(probe(sorted, "colidx_sorted"))
        .orderBy($"layout")
    }),

    // Schema-evolution read (r7): a long-lived 100-TB table is written
    // by MANY job versions — early files lack columns later ones have.
    // Stages two parquet generations from customer (v1: key+name+nation
    // for even keys; v2: key+acctbal+segment for odd), then reads both
    // through one `mergeSchema=true` scan: the unified schema is the
    // field union, absent columns null-fill per file. The oracle
    // reproduces the merged relation from the clean table via the same
    // even/odd rule. Scale: schema merge is a FOOTER operation (one
    // small read per file at planning); the data scan still prunes
    // columns per file — asserted by the hash, since a wrong merge
    // would misalign or drop fields.
    "source_parquet_evolve" -> ((s, dir) => {
      import s.implicits._
      val v1 = tmp(dir, "customer_v1")
      val v2 = tmp(dir, "customer_v2")
      val c = Tables.load(s, dir, "customer")
      c.filter($"c_custkey" % 2 === 0)
        .select($"c_custkey", $"c_name", $"c_nationkey")
        .write.mode("overwrite").parquet(v1)
      c.filter($"c_custkey" % 2 === 1)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        .write.mode("overwrite").parquet(v2)
      s.read.option("mergeSchema", "true").parquet(v1, v2)
        .select($"c_custkey", $"c_name", $"c_nationkey",
                money($"c_acctbal").cast(DoubleType).as("acctbal"),
                $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    // Kafka-wire decode + exactly-once surface (r15, verdict item 4).
    // The TRANSPORT is environment-blocked (no spark-sql-kafka-0-10
    // jar, no coursier artifact, no broker, zero egress — adjudicated
    // r13), but everything a Kafka→warehouse job implements ON TOP of
    // the connector is engine code, and that is what this key ships:
    // the exact relation `format("kafka")` returns — (key BINARY,
    // value BINARY, topic STRING, partition INT, offset LONG,
    // timestamp TIMESTAMP, timestampType INT) — is staged from
    // `events`, then the real consumer pipeline runs over it.
    //   1. Producer model (staging only): topic = event_type,
    //      partition = pmod(user_id, 8) (key-hash partitioning, so one
    //      user's events stay ordered), offset = per-(topic,partition)
    //      arrival rank over (ts, event_id) — Kafka's per-partition
    //      total order; key = the partition key's bytes, value =
    //      to_json(payload) bytes; timestampType = 0 (CreateTime).
    //   2. At-least-once delivery: every 7th message is READ twice by
    //      the consumer — a consumer-group rebalance replays records
    //      from the last committed offset, re-delivering the SAME
    //      (partition, offset). (A producer retry is the other
    //      duplicate source, but an idempotent producer dedupes it
    //      broker-side via sequence numbers, and a non-idempotent
    //      retry appends under a NEW offset — offset-dedup cannot see
    //      it; that case needs key-level dedup downstream.) Consumer
    //      replay is the failure mode offset-dedup exists for.
    //   3. Consumer (the shipped logic): from_json(CAST(value AS
    //      STRING)) with a schema PROJECTION (decodes 2 of the 3
    //      payload fields — JSON decode prunes like a column scan),
    //      then exactly-once via group-by (topic, partition, offset).
    // Output: per-topic delivery accounting (raw vs deduped counts,
    // partition spread, high-water offset) + an exact-decimal payload
    // checksum — the hash match proves binary encode → JSON decode →
    // offset dedup is lossless end-to-end.
    // Scale (100 TB): offsets arrive FROM the broker in production —
    // the row_number window is staging, not consumer logic. The
    // consumer's one shuffle is the offset-dedup group-by, partial-
    // aggregated map-side (duplicates within a partition combine
    // before the exchange); per-topic accounting is a second tiny
    // aggregate over topic cardinality. A deployment swaps the staged
    // relation for spark.readStream.format("kafka") and step 3 runs
    // unchanged.
    "source_kafka_shape" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"topic", $"partition")
        .orderBy($"ts", $"event_id")
      val wire0 = Tables.load(s, dir, "events")
        .select($"event_type".as("topic"),
          pmod($"user_id", lit(8L)).cast(IntegerType).as("partition"),
          $"event_id", $"user_id", $"ts", $"value")
        .withColumn("offset", row_number().over(w).cast(LongType) - 1L)
      // The wire relation, Kafka's exact 7-column source schema
      // (key, value, topic, partition, offset, timestamp,
      // timestampType): key/value are BINARY (the consumer owns the
      // decode), offsets are the (topic, partition)-scoped log
      // positions, timestampType 0 = CreateTime.
      val wire = wire0.union(wire0.filter($"event_id" % 7 === 0))
        .select(
          $"user_id".cast(StringType).cast(BinaryType).as("key"),
          to_json(struct($"event_id", $"user_id", $"value"))
            .cast(BinaryType).as("value"),
          $"topic", $"partition", $"offset",
          $"ts".as("timestamp"),
          lit(0).as("timestampType"))
      // Consumer decode: schema projection over the JSON payload.
      val payload = new StructType()
        .add("event_id", LongType).add("value", DoubleType)
      val decoded = wire
        .withColumn("js", from_json($"value".cast(StringType), payload))
        .select($"topic", $"partition", $"offset",
          $"js.event_id".as("event_id"), $"js.value".as("v"))
      // Exactly-once: one survivor per (topic, partition, offset).
      // Duplicates are byte-identical deliveries, so max() is a
      // deterministic pick (and would surface a corrupt redelivery as
      // a checksum mismatch rather than silently keeping one copy).
      val msgs = decoded
        .groupBy($"topic", $"partition", $"offset")
        .agg(max($"event_id").as("event_id"), max($"v").as("v"))
      val rawN = decoded.groupBy($"topic").agg(count(lit(1)).as("n_raw"))
      msgs.groupBy($"topic")
        .agg(count(lit(1)).as("n_msgs"),
          countDistinct($"partition").as("n_parts"),
          max($"offset").as("max_offset"),
          min($"event_id").as("min_id"), max($"event_id").as("max_id"),
          dsum($"v").as("sum_v"))
        .join(rawN, "topic")
        .select($"topic", $"n_raw", $"n_msgs", $"n_parts",
          $"max_offset", $"min_id", $"max_id", $"sum_v")
        .orderBy($"topic")
    }))

  def oracle: Seq[(String, String)] = Seq(
    "scan_parquet" ->
      """SELECT count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem""".stripMargin,

    "scan_metadata" ->
      """SELECT count(*) AS n_rows,
        |  min(event_id) AS min_id, max(event_id) AS max_id,
        |  TRUE AS all_paths, TRUE AS all_sized
        |FROM events""".stripMargin,

    "scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_extendedprice > 90000.0
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,

    "scan_time_range" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-16'
        |  AND ts < TIMESTAMP '2024-01-18'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "source_csv" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "source_json" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    // Round-trip is lossless, so the oracle is the original table —
    // a hash-match proves the text encode/parse lost nothing.
    "source_text" ->
      """SELECT doc_id, text FROM documents ORDER BY doc_id""".stripMargin,

    // Corruption is keyed on s_suppkey % 7, so DuckDB reproduces the
    // good/corrupt split from the clean table.
    "source_csv_malformed" ->
      """SELECT count(*) AS n_rows,
        |  count(*) FILTER (WHERE s_suppkey % 7 <> 0) AS n_good,
        |  count(*) FILTER (WHERE s_suppkey % 7 = 0) AS n_corrupt,
        |  CAST(sum(s_suppkey) FILTER (WHERE s_suppkey % 7 <> 0)
        |    AS BIGINT) AS sum_good_keys
        |FROM supplier""".stripMargin,

    "source_orc" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "source_avro" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "source_json_corrupt" ->
      """SELECT count(*) AS n_rows,
        |  count(*) FILTER (WHERE n_nationkey % 5 <> 0) AS n_good,
        |  count(*) FILTER (WHERE n_nationkey % 5 = 0) AS n_corrupt,
        |  CAST(sum(n_nationkey) FILTER (WHERE n_nationkey % 5 <> 0)
        |    AS BIGINT) AS sum_good_keys,
        |  min('{corrupt ' || n_name || ' #' ||
        |      CAST(n_nationkey AS VARCHAR))
        |    FILTER (WHERE n_nationkey % 5 = 0) AS corrupt_sample
        |FROM nation""".stripMargin,

    "source_binaryfile" ->
      """SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS fname,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents WHERE doc_id < 20 ORDER BY fname""".stripMargin,

    "scan_dpp" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Layout is execution strategy; the oracle probes the plain table
    // with the same (min, floor-mid, max) keys via scalar subqueries.
    // Both engines compute mid on non-negative keys, so truncating
    // and floor division agree.
    "scan_bloom_idx" ->
      """WITH k AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi,
        |    (min(o_orderkey) + max(o_orderkey)) // 2 AS mid
        |  FROM orders),
        |m AS (SELECT o.o_orderkey, o.o_totalprice
        |  FROM orders o, k WHERE o.o_orderkey IN (k.lo, k.mid, k.hi)),
        |a AS (SELECT count(*) AS n,
        |    count(DISTINCT o_orderkey) AS n_keys,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_price
        |  FROM m)
        |SELECT 'bloom_scatter' AS layout, n, n_keys, sum_price FROM a
        |UNION ALL
        |SELECT 'colidx_sorted' AS layout, n, n_keys, sum_price FROM a
        |ORDER BY layout""".stripMargin,

    "sink_compaction_plan" ->
      """WITH d AS (SELECT source, doc_id, n_chars,
        |    COALESCE(sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS prior
        |  FROM documents)
        |SELECT source, CAST(prior // 2000 AS BIGINT) AS bin,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS bin_chars,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM d GROUP BY source, bin ORDER BY source, bin""".stripMargin,

    "sink_parquet_part" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The bucketed layout is pure execution strategy — the oracle is
    // the plain join (join_skew_salted's proof discipline).
    "sink_bucketed" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // The merged read null-fills each generation's absent columns;
    // the even/odd staging rule reproduces that from the clean table.
    "source_parquet_evolve" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 2 = 0 THEN c_name END AS c_name,
        |  CASE WHEN c_custkey % 2 = 0 THEN c_nationkey END AS c_nationkey,
        |  CASE WHEN c_custkey % 2 = 1
        |    THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE)
        |  END AS acctbal,
        |  CASE WHEN c_custkey % 2 = 1 THEN c_mktsegment END AS c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // The JSON encode/decode is lossless (2-decimal doubles round-trip
    // exactly through Jackson's shortest-repr format), so the oracle
    // reproduces the producer model + at-least-once duplication +
    // offset dedup directly on the clean table. user_id >= 0 in every
    // fixture, so DuckDB's % matches Spark's pmod.
    "source_kafka_shape" ->
      """WITH wire AS (
        |  SELECT event_type AS topic, user_id % 8 AS part_id,
        |    row_number() OVER (PARTITION BY event_type, user_id % 8
        |                       ORDER BY ts, event_id) - 1 AS offs,
        |    event_id, value
        |  FROM events
        |), raw AS (
        |  SELECT * FROM wire
        |  UNION ALL
        |  SELECT * FROM wire WHERE event_id % 7 = 0
        |), msgs AS (
        |  SELECT topic, part_id, offs,
        |    max(event_id) AS event_id, max(value) AS v
        |  FROM raw GROUP BY 1, 2, 3
        |), rawn AS (
        |  SELECT topic, count(*) AS n_raw FROM raw GROUP BY 1
        |)
        |SELECT m.topic, r.n_raw, count(*) AS n_msgs,
        |  count(DISTINCT m.part_id) AS n_parts,
        |  max(m.offs) AS max_offset,
        |  min(m.event_id) AS min_id, max(m.event_id) AS max_id,
        |  CAST(sum(CAST(m.v AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM msgs m JOIN rawn r ON m.topic = r.topic
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin)
}
