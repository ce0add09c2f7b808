package graft

import org.apache.spark.sql.types._

/** Fixture-generation canary (r9 verdict item 7): the driver
  * regenerates the parquet fixtures between rounds and has already
  * changed physical encodings once (events.ts timestamp[ns] →
  * timestamp[us] NTZ, which analysis-failed 49 keys in r9). This
  * suite loads EVERY table through the library loader and pins the
  * resolved names + canonical types against `Tables.schemas`, so the
  * next upstream regeneration fails in one named test instead of 51
  * scattered ones.
  */
class FixtureCanarySpec extends SparkTestBase {

  /** Canonicalize the two parquet timestamp flavors: non-events
    * tables are read raw, so an isAdjustedToUTC flip (LTZ↔NTZ) is a
    * value-preserving encoding change under the pinned UTC session,
    * not a contract break. Nested element nullability is likewise a
    * writer detail. */
  private def canon(dt: DataType): DataType = dt match {
    case TimestampNTZType => TimestampType
    case ArrayType(e, _)  => ArrayType(canon(e), containsNull = true)
    case StructType(fs)   => StructType(fs.map(f =>
      f.copy(dataType = canon(f.dataType), nullable = true)))
    case MapType(k, v, _) => MapType(canon(k), canon(v),
      valueContainsNull = true)
    case other            => other
  }

  test("every fixture table resolves to the declared schema") {
    Tables.schemas.foreach { case (name, declared) =>
      val got = Tables.load(spark, sf, name).schema
      assert(got.fields.map(_.name).toSeq ==
               declared.fields.map(_.name).toSeq,
        s"$name: column names/order drifted — " +
          s"got ${got.fields.map(_.name).mkString(",")}")
      got.fields.zip(declared.fields).foreach { case (g, d) =>
        assert(canon(g.dataType) == canon(d.dataType),
          s"$name.${g.name}: fixture type ${g.dataType.sql} is not " +
            s"canonically ${d.dataType.sql} — upstream regeneration " +
            "changed the physical encoding; fix Tables.load to " +
            "canonicalize it")
      }
    }
  }

  test("events.ts canonicalizes to TIMESTAMP regardless of encoding") {
    // The loader's whole job: downstream code (window ranges,
    // getTimestamp, streaming schemas) sees one type across fixture
    // generations.
    val dt = Tables.load(spark, sf, "events").schema("ts").dataType
    assert(dt == TimestampType, s"events.ts resolved as ${dt.sql}")
  }
}
