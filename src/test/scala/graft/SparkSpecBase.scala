package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (small core count keeps test JVMs light;
  * the scale-shaped configs still match GraftSession). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sfDir = "/root/testdata/sf0.001"
}
