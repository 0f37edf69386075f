package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.time.LocalDate

/** The retrain-trigger rule and its state plumbing — pure driver logic,
  * no Spark session needed (the reference keeps it in Airflow python;
  * dag_functions.py:61–99, 344–357, 794–848).
  */
class LifecycleSpec extends AnyFunSuite {
  import Lifecycle._

  private val d0 = LocalDate.parse("2024-01-07")

  test("metric trigger: macro_f1 < 0.87 retrains, >= 0.87 does not") {
    assert(shouldRetrain(Some(0.8699), Some(d0), d0.plusDays(7)).retrain)
    assert(!shouldRetrain(Some(0.87), Some(d0), d0.plusDays(7)).retrain,
      "threshold is strict less-than (dag_functions.py:89)")
    assert(!shouldRetrain(Some(0.95), Some(d0), d0.plusDays(7)).retrain)
  }

  test("time trigger: >= 90 days retrains even with healthy metrics") {
    assert(!shouldRetrain(Some(0.95), Some(d0), d0.plusDays(89)).retrain)
    assert(shouldRetrain(Some(0.95), Some(d0), d0.plusDays(90)).retrain)
    assert(shouldRetrain(None, Some(d0), d0.plusDays(120)).retrain)
  }

  test("no metrics and no tracker: no retrain (initial training is a separate branch)") {
    assert(!shouldRetrain(None, None, d0).retrain)
    // metrics missing but tracker fresh: also no
    assert(!shouldRetrain(None, Some(d0), d0.plusDays(7)).retrain)
  }

  test("metric trigger takes precedence in the reason") {
    val dec = shouldRetrain(Some(0.5), Some(d0), d0.plusDays(365))
    assert(dec.retrain && dec.reason.contains("macro_f1"))
  }

  test("tracker round-trips state; absent file reads None") {
    val p = Files.createTempDirectory("tracker").toString + "/last_retraining_date.json"
    val t = new RetrainTracker(p)
    assert(t.read().isEmpty)
    t.write(TrackerState(d0, "credit_scoring_model", 3, 0.9123))
    val s = t.read().get
    assert(s.lastRetrainingDate == d0 && s.modelName == "credit_scoring_model"
      && s.modelVersion == 3 && s.macroF1 == 0.9123)
  }

  test("tracker reads a reference-shaped file with unquoted JSON numbers") {
    // the reference json.dumps model_version/macro_f1_score as numbers
    // (dag_functions.py:344–357) — the tracker must parse that shape too
    val p = Files.createTempDirectory("tracker2").toString + "/last_retraining_date.json"
    Files.writeString(java.nio.file.Paths.get(p),
      """{"last_retraining_date": "2024-01-07", "model_name": "credit_scoring_model",
        | "model_version": 3, "macro_f1_score": 0.9123}""".stripMargin)
    val s = new RetrainTracker(p).read().get
    assert(s.lastRetrainingDate == d0 && s.modelVersion == 3 && s.macroF1 == 0.9123)
  }

  test("registry rejects model names containing the key separator") {
    val p = Files.createTempDirectory("reg2").toString + "/registry.json"
    val r = new JsonRegistry(p)
    r.register("m", "/runs/a")
    intercept[IllegalArgumentException](r.register("m/2", "/runs/evil"))
    intercept[IllegalArgumentException](r.promote("m/2", 1))
    intercept[IllegalArgumentException](r.production("m/2"))
  }

  test("registry: register versions, promote archives the incumbent") {
    val p = Files.createTempDirectory("reg").toString + "/registry.json"
    val r = new JsonRegistry(p)
    assert(r.production("m").isEmpty)
    assert(r.register("m", "/runs/a") == 1)
    assert(r.register("m", "/runs/b") == 2)
    r.promote("m", 1)
    assert(r.production("m").get == RegisteredModel("m", 1, "/runs/a", "Production"))
    r.promote("m", 2)
    val prod = r.production("m").get
    assert(prod.version == 2 && prod.runPath == "/runs/b")
    // exactly one Production version exists after re-promotion
    val raw = graft.sources.Sources.readJsonSidecar(p)
    assert(raw.count(_._2 == "Production") == 1)
    assert(raw("m/1/stage") == "Archived")
    intercept[IllegalArgumentException](r.promote("m", 99))
    // independent names don't interfere
    assert(r.register("other", "/runs/x") == 1)
    r.promote("other", 1)
    assert(r.production("m").get.version == 2)
  }

  test("registerAndPromote resets the 90-day timer") {
    val dir = Files.createTempDirectory("lc").toString
    val tracker = new RetrainTracker(s"$dir/tracker.json")
    val registry = new JsonRegistry(s"$dir/registry.json")
    val v = registerAndPromote(registry, tracker, "credit_scoring_model",
      "/runs/r1", d0, 0.91)
    assert(v == 1)
    assert(tracker.read().get.lastRetrainingDate == d0)
    assert(!shouldRetrain(Some(0.91),
      tracker.read().map(_.lastRetrainingDate), d0.plusDays(7)).retrain)
  }
}
