package graft.run

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Pins the O4 failure-alerting contract
  * (dags/mssql_to_postgresql_orders_daily.py:68-75,138-140): recipient
  * parsing, armed-vs-unarmed behavior, the JSONL spool, and that a
  * failing stage fires the hook with the run-date context and still
  * fails. */
class AlertsSpec extends AnyFunSuite {

  test("recipient parse mirrors the reference: comma split, trim, " +
      "'@' required") {
    assert(Alerts.recipients(" a@x.com , b@y.org ,, not-an-email ,")
      == Seq("a@x.com", "b@y.org"))
    assert(Alerts.recipients("") == Seq.empty)
  }

  test("a failing stage fires the armed hook with run-date context, " +
      "spools one JSON line, and the failure still propagates") {
    val dir = Files.createTempDirectory("alerts").toString
    val sink = s"$dir/spool/alerts.jsonl"
    val hook = Alerts.fromEnv(Map(
      "ALERT_EMAIL_RECIPIENTS" -> "ops@example.com,lead@example.com",
      "GRAFT_ALERT_SINK" -> sink))
    val boom = intercept[IllegalStateException] {
      Alerts.onFailure(hook, "orders", "1996-03-09", "daily-sync") {
        throw new IllegalStateException("""extract "died"""")
      }
    }
    assert(boom.getMessage.contains("died"), "rethrow must preserve")
    val lines = Files.readAllLines(Paths.get(sink)).asScala
    assert(lines.size == 1)
    val l = lines.head
    assert(l.contains(""""run_date":"1996-03-09""""))
    assert(l.contains(""""entity":"orders""""))
    assert(l.contains(""""stage":"daily-sync""""))
    assert(l.contains("""\"died\""""), s"quotes must escape: $l")
    assert(l.contains("ops@example.com") && l.contains("lead@example.com"))

    // mismatch notifications append to the same spool
    Alerts.onMismatch(hook, "orders", "1996-03-10", 100L, 97L)
    val lines2 = Files.readAllLines(Paths.get(sink)).asScala
    assert(lines2.size == 2)
    assert(lines2(1).contains("extracted=100 loaded=97"))
    assert(lines2(1).contains(""""stage":"validate""""))
  }

  test("a broken spool never masks the original failure, and a " +
      "mismatch notification never aborts the run") {
    val dir = Files.createTempDirectory("alerts").toString
    // the sink path IS a directory — every append attempt fails
    val hook = Alerts.fromEnv(Map(
      "ALERT_EMAIL_RECIPIENTS" -> "ops@example.com",
      "GRAFT_ALERT_SINK" -> dir))
    val boom = intercept[IllegalStateException] {
      Alerts.onFailure(hook, "orders", "1996-03-09", "load") {
        throw new IllegalStateException("root cause")
      }
    }
    assert(boom.getMessage == "root cause",
      "the ORIGINAL failure must propagate, not the spool IOException")
    // log-only validation stays log-only even when the spool is broken
    Alerts.onMismatch(hook, "orders", "1996-03-09", 10L, 9L)
    // a hook that itself throws is contained too
    val throwing: Alerts.Hook = _ => sys.error("hook bug")
    Alerts.onMismatch(throwing, "orders", "1996-03-09", 10L, 9L)
    val boom2 = intercept[IllegalStateException] {
      Alerts.onFailure(throwing, "orders", "1996-03-09", "x") {
        throw new IllegalStateException("still the root cause")
      }
    }
    assert(boom2.getMessage == "still the root cause")
  }

  test("no valid recipient leaves the hook unarmed: nothing spooled, " +
      "body result passes through") {
    val dir = Files.createTempDirectory("alerts").toString
    val sink = s"$dir/unarmed.jsonl"
    val hook = Alerts.fromEnv(Map(
      "ALERT_EMAIL_RECIPIENTS" -> "not-an-email",
      "GRAFT_ALERT_SINK" -> sink))
    assert(Alerts.onFailure(hook, "orders", "1996-03-09", "x")(41 + 1)
      == 42)
    intercept[RuntimeException] {
      Alerts.onFailure(hook, "orders", "1996-03-09", "x") {
        throw new RuntimeException("boom")
      }
    }
    assert(!Files.exists(Paths.get(sink)),
      "unarmed hook must not write the spool")
  }
}
