package graft.ml

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import java.time.temporal.ChronoUnit
import graft.sources.Sources

/** Weekly model lifecycle: the retrain-trigger decision rule, its JSON
  * tracker state, and a minimal model registry with stage promotion —
  * the heart of the reference's weekly flow
  * (dag_functions.py:61–99 trigger, :344–357 tracker, :794–848 registry).
  *
  * All state is driver-side JSON sidecars (O(1) control files — no Spark
  * jobs), matching the reference's last_retraining_date.json; the
  * registry mirrors the MLflow registry shape it uses: versioned names,
  * at most one Production version per name, promotion archives the
  * previous Production.
  */
object Lifecycle {

  /** dag_functions.py:89 — retrain when macro-F1 degrades below this. */
  val F1Threshold = 0.87

  /** dag_functions.py:86 — retrain when this many days passed since the
    * last retraining, regardless of metric health. */
  val RetrainAfterDays = 90L

  final case class Decision(retrain: Boolean, reason: String)

  /** The trigger rule, faithfully (dag_functions.py:61–99):
    *  - metric trigger: a macro-F1 observation exists AND is below the
    *    threshold;
    *  - time trigger: a last-retraining date exists AND today − date
    *    ≥ maxDays;
    *  - retrain iff either fires. With NO metrics and NO tracker the
    *    answer is "don't retrain" — initial training is a separate branch
    *    in the reference (decide_pipeline_path), not this rule's job.
    * Metric is checked before time, so the reason string reflects the
    * reference's precedence. */
  def shouldRetrain(macroF1: Option[Double], lastRetrain: Option[LocalDate],
                    today: LocalDate, f1Threshold: Double = F1Threshold,
                    maxDays: Long = RetrainAfterDays): Decision = {
    val metricTrigger = macroF1.exists(_ < f1Threshold)
    val days = lastRetrain.map(d => ChronoUnit.DAYS.between(d, today))
    val timeTrigger = days.exists(_ >= maxDays)
    if (metricTrigger)
      Decision(retrain = true,
        f"macro_f1 ${macroF1.get}%.4f below threshold $f1Threshold")
    else if (timeTrigger)
      Decision(retrain = true,
        s"${days.get} days since last retraining >= $maxDays")
    else
      Decision(retrain = false,
        s"no retraining needed (macro_f1=${macroF1.getOrElse("N/A")}, " +
          s"days_since=${days.getOrElse("N/A")})")
  }

  final case class TrackerState(lastRetrainingDate: LocalDate,
                                modelName: String, modelVersion: Int,
                                macroF1: Double)

  /** JSON tracker sidecar (last_retraining_date.json shape,
    * dag_functions.py:344–357): written on every registration, read by
    * the trigger check. Absent file ⇒ no state, like the reference. */
  final class RetrainTracker(path: String) {
    def read(): Option[TrackerState] =
      if (!Files.exists(Paths.get(path))) None
      else {
        val kv = Sources.readJsonSidecar(path)
        kv.get("last_retraining_date").map { d =>
          TrackerState(LocalDate.parse(d),
            kv.getOrElse("model_name", ""),
            kv.get("model_version").map(_.toInt).getOrElse(0),
            kv.get("macro_f1_score").map(_.toDouble).getOrElse(Double.NaN))
        }
      }

    def write(state: TrackerState): Unit =
      Sources.writeJsonSidecar(path, Map(
        "last_retraining_date" -> state.lastRetrainingDate.toString,
        "model_name" -> state.modelName,
        "model_version" -> state.modelVersion.toString,
        "macro_f1_score" -> state.macroF1.toString))
  }

  final case class RegisteredModel(name: String, version: Int,
                                   runPath: String, stage: String)

  /** Registry contract (MLflow-registry shape the reference drives):
    * register creates a new version; promote transitions it to
    * Production and archives the incumbent; production resolves what
    * inference should serve (dag_functions.py:462–470). */
  trait Registry {
    def register(name: String, runPath: String): Int
    def promote(name: String, version: Int): Unit
    def production(name: String): Option[RegisteredModel]
  }

  /** JSON-sidecar registry: flat key space
    * `name/latest`, `name/<v>/run`, `name/<v>/stage`. Model names must
    * not contain '/' — it is the key separator, and a name like "m/2"
    * would alias into another model's version keys. */
  final class JsonRegistry(path: String) extends Registry {
    private def load(): Map[String, String] =
      if (Files.exists(Paths.get(path))) Sources.readJsonSidecar(path)
      else Map.empty

    private def checkName(name: String): Unit =
      require(!name.contains("/"),
        s"model name must not contain '/': $name")

    def register(name: String, runPath: String): Int = {
      checkName(name)
      val m = load()
      val v = m.getOrElse(s"$name/latest", "0").toInt + 1
      Sources.writeJsonSidecar(path, m ++ Map(
        s"$name/latest" -> v.toString,
        s"$name/$v/run" -> runPath,
        s"$name/$v/stage" -> "None"))
      v
    }

    def promote(name: String, version: Int): Unit = {
      checkName(name)
      val m = load()
      require(m.contains(s"$name/$version/run"),
        s"unknown model version $name v$version")
      val demoted = m.map { case (k, v) =>
        if (k.startsWith(s"$name/") && k.endsWith("/stage") && v == "Production")
          k -> "Archived"
        else k -> v
      }
      Sources.writeJsonSidecar(path,
        demoted + (s"$name/$version/stage" -> "Production"))
    }

    def production(name: String): Option[RegisteredModel] = {
      checkName(name)
      val m = load()
      m.collectFirst {
        case (k, "Production")
            if k.startsWith(s"$name/") && k.endsWith("/stage") =>
          val v = k.stripPrefix(s"$name/").stripSuffix("/stage").toInt
          RegisteredModel(name, v, m(s"$name/$v/run"), "Production")
      }
    }
  }

  /** register_model_weekly (dag_functions.py:794–848): register the
    * winning run, promote it to Production, reset the 90-day timer by
    * rewriting the tracker. Returns the new version. */
  def registerAndPromote(registry: Registry, tracker: RetrainTracker,
                         name: String, runPath: String,
                         logicalDate: LocalDate, macroF1: Double): Int = {
    val v = registry.register(name, runPath)
    registry.promote(name, v)
    tracker.write(TrackerState(logicalDate, name, v, macroF1))
    v
  }
}
