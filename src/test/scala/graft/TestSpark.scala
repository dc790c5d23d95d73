package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    // the warehouse dir outlives the JVM but the in-memory catalog does not:
    // a stale managed-table location from a previous test run fails any
    // saveAsTable with LOCATION_ALREADY_EXISTS — start from a clean slate
    def wipe(f: java.io.File): Unit = {
      // listFiles() returns null (not empty) on I/O error or if the dir
      // vanishes under us (two forked test JVMs racing on the shared /tmp)
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
      f.delete(); ()
    }
    wipe(new java.io.File("/tmp/graft-test-warehouse"))
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("flatbreadspark-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
      // every suite runs through the production deployment route: the
      // graft functions arrive via session extensions, not register()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
