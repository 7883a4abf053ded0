package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = () // keep the session for other suites
}

object SparkSpec {
  // Core count is a knob (-Dgraft.test.cores=N) so the parallel test
  // groups in build.sbt can give the CPU-bound soak suites a wider
  // session while ordinary groups stay at the historical local[4].
  // shuffle.partitions stays 4 regardless: plan-shape assertions
  // (single-partition-exchange audits, window keys) key off it.
  private val cores = sys.props.getOrElse("graft.test.cores", "4")
  lazy val session: SparkSession = SparkSession.builder()
    .master(s"local[$cores]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
