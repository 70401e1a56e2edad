package graft.run

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** O4: failure alerting, the reference's `email_on_failure` contract
  * (dags/mssql_to_postgresql_orders_daily.py:68-75,138-140) —
  * recipients come from `ALERT_EMAIL_RECIPIENTS` (comma-separated,
  * entries without an '@' dropped, exactly the reference's parse), and
  * alerting is armed only when at least one recipient survives
  * (`email_on_failure = bool(ALERT_EMAIL_RECIPIENTS)`).
  *
  * Transport: the reference posts to a mailhog SMTP sandbox
  * (docker-compose.yaml:3-8); this engine has no egress, so the armed
  * hook appends one JSON line per alert to `GRAFT_ALERT_SINK` (a
  * local mail-spool stand-in a deployment replaces with its SMTP or
  * webhook relay) and always logs. Driver-side control-plane IO only —
  * an alert is one line, never a data-plane write.
  */
object Alerts {

  /** One failure notification: which entity/sync, which logical date,
    * which stage blew up, and what it said. */
  final case class Alert(
      entity: String,
      runDate: String,
      stage: String,
      message: String)

  type Hook = Alert => Unit

  /** Parse `ALERT_EMAIL_RECIPIENTS` the reference's way
    * (orders_daily.py:69-70): split on commas, trim, keep entries
    * containing '@'. */
  def recipients(raw: String): Seq[String] =
    raw.split(',').map(_.trim).filter(e => e.nonEmpty && e.contains('@'))
      .toSeq

  /** Build the failure hook from the environment. Unarmed (no valid
    * recipient) → log-only, mirroring the reference's warning +
    * `email_on_failure=False`. Armed → log + append a JSON line to the
    * sink spool when one is configured. The spool append is
    * BEST-EFFORT: a broken spool (unwritable path, full disk) logs its
    * own warning and never throws — alerting must not mask the
    * failure it reports, nor turn log-only validation into an abort. */
  def fromEnv(env: Map[String, String] = sys.env): Hook = {
    val to = recipients(env.getOrElse("ALERT_EMAIL_RECIPIENTS", ""))
    val sink = env.get("GRAFT_ALERT_SINK")
    if (to.isEmpty) { a =>
      println(s"[alert] (no recipients configured — not sent) ${render(a)}")
    } else { a =>
      println(s"[alert] to=${to.mkString(",")} ${render(a)}")
      sink.foreach { path =>
        try {
          val p = Paths.get(path)
          Option(p.getParent).foreach(Files.createDirectories(_))
          val line = jsonLine(a, to) + "\n"
          Files.write(p, line.getBytes(StandardCharsets.UTF_8),
            StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        } catch {
          case e: Exception =>
            println(s"[alert] WARN spool append failed ($path): $e")
        }
      }
    }
  }

  /** Run `body`; on any exception fire the hook with the run-date
    * context and rethrow the ORIGINAL failure (the task still fails —
    * alerting never swallows, exactly Airflow's on-failure semantics;
    * a throwing hook is contained so it can never shadow the root
    * cause). */
  def onFailure[T](hook: Hook, entity: String, runDate: String,
      stage: String)(body: => T): T =
    try body
    catch {
      case e: Throwable =>
        fireSafely(hook, Alert(entity, runDate, stage,
          Option(e.getMessage).getOrElse(e.getClass.getName)))
        throw e
    }

  /** Count-reconciliation mismatch notification: validation stays
    * log-only (the run proceeds, orders_daily.py:580-584), but an
    * armed hook hears about it — and a broken hook cannot turn the
    * log-only contract into a run abort. */
  def onMismatch(hook: Hook, entity: String, runDate: String,
      extracted: Long, loaded: Long): Unit =
    fireSafely(hook, Alert(entity, runDate, "validate",
      s"count mismatch: extracted=$extracted loaded=$loaded"))

  private def fireSafely(hook: Hook, a: Alert): Unit =
    try hook(a)
    catch {
      case e: Exception =>
        println(s"[alert] WARN alert hook failed: $e (for ${render(a)})")
    }

  private def render(a: Alert): String =
    s"entity=${a.entity} run_date=${a.runDate} stage=${a.stage}: " +
      a.message

  private def jsonLine(a: Alert, to: Seq[String]): String = {
    import graft.core.Jsons.{str => js}
    s"{\"to\":[${to.map(js).mkString(",")}]," +
      s"\"entity\":${js(a.entity)},\"run_date\":${js(a.runDate)}," +
      s"\"stage\":${js(a.stage)},\"message\":${js(a.message)}}"
  }
}
