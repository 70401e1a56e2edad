package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions

/** Shared local SparkSession for the suite (getOrCreate dedups across
  * specs; sbt forks one test JVM). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("graft-test")
}
