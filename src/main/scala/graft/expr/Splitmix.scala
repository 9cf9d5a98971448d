package graft.expr

/** splitmix64 finalizer (Steele/Lea/Flood 2014 — the JDK
  * SplittableRandom mixer): the repo's shared deterministic
  * stateless hash for derived pseudo-randomness — LSH plane
  * components (operators/Dedup.planeMatrix), level-sampling retention
  * (streaming/ListStateMedian). One copy so a seed-discipline change
  * can never silently diverge between call sites.
  */
object Splitmix {
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
