package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + row-set comparison helpers for all suites. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }

  val sf: String = "/root/testdata/sf0.001"

  /** Order-insensitive exact row comparison. */
  def assertSameRows(got: DataFrame, want: DataFrame, hint: String = "")
      : Unit = {
    val g = got.collect().map(_.toString).sorted
    val w = want.collect().map(_.toString).sorted
    assert(g.length == w.length,
      s"$hint row counts differ: got ${g.length}, want ${w.length}")
    g.zip(w).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"$hint row $i differs:\n  got  $a\n  want $b")
    }
  }

  /** Fresh scratch dir under target/ for a test. */
  def scratch(name: String): String = {
    val dir = new java.io.File(s"target/testwork/$name")
    Util.deleteRecursively(dir)
    dir.mkdirs()
    dir.getPath
  }
}
