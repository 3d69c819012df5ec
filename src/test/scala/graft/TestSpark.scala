package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.sql.shuffle.partitions", "4")
      // mirror the judged sessions: runtime Bloom-filter pruning with the
      // application-side threshold lowered for test-scale demonstration
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  /** Driver-generated corpus root, overridable for other checkouts. */
  def testdata(scale: String): String =
    sys.env.getOrElse("GRAFT_TESTDATA", "/root/testdata") + s"/sf$scale"
}
