package graft.ingest

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck properties for the sequencer (SURVEY §5.3): strictly
  * increasing, gap-free ordering for arbitrary input permutations,
  * arbitrary prevMax, and arbitrary (possibly regressed) clocks —
  * clock.go:34-56 semantics.
  */
class SequencerPropertySpec extends SparkSpec {
  import spark.implicits._

  test("∀ inputs, prevMax, clock: stamp is gap-free, ordered, never regresses") {
    val gen = for {
      n <- Gen.choose(1, 200)
      perm <- Gen.const(scala.util.Random.shuffle((1L to n.toLong).toList))
      prevMax <- Gen.choose(0L, 1000000L)
      now <- Gen.choose(0L, 2000000L)
    } yield (perm, prevMax, now)

    val prop = Prop.forAllNoShrink(gen) { case (perm, prevMax, now) =>
      val df = perm.map(i => (i, s"did$i")).toDF("arrival", "did")
      val seq = Sequencer.stamp(df, Seq("arrival"), prevMax, () => now)
      val stamped = seq.df.orderBy("arrival").select("time_us").as[Long].collect()
      val base = math.max(prevMax + 1, now)
      val gapFree = stamped.toSeq == (base until base + perm.size)
      val noRegress = stamped.head > prevMax
      val hwmRight = seq.maxTimeUs == base + perm.size - 1
      gapFree && noRegress && hwmRight
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }
}
