package graft

/** S12 readiness probe — the last previously-manual-only component:
  * verdict true on a live session + readable data dir, false when the
  * data dir is missing (the k8s readinessProbe failure path).
  */
class ProbeSpec extends SparkSpec {

  test("probe passes on a live session with a readable data dir") {
    assert(Probe.check(spark, sf()))
  }

  test("probe fails when the data dir does not exist") {
    assert(!Probe.check(spark, "/nonexistent/graft-probe-dir"))
  }
}
