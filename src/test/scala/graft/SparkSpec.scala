package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM, one context). */
object SparkSpec {
  lazy val spark: SparkSession = GraftSession.local("4")
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
}
