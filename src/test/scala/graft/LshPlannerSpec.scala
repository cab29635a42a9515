package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LshPlanner

/** The S-curve arithmetic is closed-form, so the spec pins it against
  * hand values and the qualitative properties every MMDS treatment
  * states: monotonicity in s, the (1/b)^(1/r) knee, and the
  * recall-vs-cost direction of the weights.
  */
class LshPlannerSpec extends AnyFunSuite {

  test("collision probability matches hand values and is monotone") {
    // b=1: P = s^r exactly; r=1: P = 1-(1-s)^b exactly
    assert(math.abs(LshPlanner.collisionProb(0.5, 1, 3) - 0.125) < 1e-12)
    assert(math.abs(LshPlanner.collisionProb(0.5, 2, 1) - 0.75) < 1e-12)
    // the MMDS worked example: b=20, r=5 at s=0.8
    val p = LshPlanner.collisionProb(0.8, 20, 5)
    assert(math.abs(p - (1.0 - math.pow(1.0 - math.pow(0.8, 5), 20))) < 1e-12
      && p > 0.999)
    val grid = (0 to 100).map(i => LshPlanner.collisionProb(i / 100.0, 16, 8))
    grid.sliding(2).foreach { case Seq(a, b) => assert(a <= b + 1e-12) }
    assert(grid.head === 0.0 && math.abs(grid.last - 1.0) < 1e-12)
  }

  test("the knee approximation and the chosen scheme track the threshold") {
    assert(math.abs(LshPlanner.thresholdOf(20, 5) -
      math.pow(0.05, 0.2)) < 1e-12)
    // 128 components: a high threshold wants long bands (sharp curve,
    // knee to the right), a low one wants many short bands
    val (bHi, rHi) = LshPlanner.choose(128, 0.9)
    val (bLo, rLo) = LshPlanner.choose(128, 0.4)
    assert(bHi * rHi === 128 && bLo * rLo === 128)
    assert(rHi > rLo && bLo > bHi)
    assert(LshPlanner.thresholdOf(bHi, rHi) >
      LshPlanner.thresholdOf(bLo, rLo))
    // recall weighting: pushing fnWeight up moves the effective knee
    // LEFT of (or equal to) the neutral choice — never right
    val (bR, rR) = LshPlanner.choose(128, 0.7, fnWeight = 50.0)
    val (bN, rN) = LshPlanner.choose(128, 0.7, fnWeight = 1.0)
    assert(LshPlanner.thresholdOf(bR, rR) <=
      LshPlanner.thresholdOf(bN, rN) + 1e-12)
  }

  test("degenerate parameters are rejected") {
    intercept[IllegalArgumentException](LshPlanner.choose(0, 0.5))
    intercept[IllegalArgumentException](LshPlanner.choose(16, 0.0))
    intercept[IllegalArgumentException](LshPlanner.choose(16, 1.0))
  }
}
