package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session, ScalaTest
  * runs suites sequentially in the forked JVM).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sqlCtx: SparkSession = spark
}

object SparkSpec {
  lazy val session: SparkSession = {
    // keep metastore + warehouse artifacts out of the repo working dir
    val tmp = java.nio.file.Files.createTempDirectory("graft_spark").toString
    System.setProperty("derby.system.home", tmp)
    val s = SparkSession.builder()
      .config("spark.sql.warehouse.dir", s"$tmp/warehouse")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(s)
    s
  }
}
