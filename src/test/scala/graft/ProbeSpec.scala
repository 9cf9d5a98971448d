package graft

/** S12 readiness probe (Probe.scala; reference probe.py:7-50): the
  * reference's k8s readinessProbe runs a trivial store query and a
  * connectivity check, exiting 0 when both answer and 1 otherwise.
  * `Probe.check` is the factored decision — asserted in both verdict
  * directions against the live session (the `main` wrapper only maps
  * the boolean to an exit code around its own SparkSession).
  */
class ProbeSpec extends SparkSpec {

  test("probe passes against a readable data dir (the exit-0 path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_").toString
    assert(Probe.check(spark, dir))
  }

  test("probe fails against a missing data dir (the exit-1 path)") {
    assert(!Probe.check(spark, "/no/such/graft/data/dir"))
  }
}
