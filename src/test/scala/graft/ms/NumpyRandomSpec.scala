package graft.ms

import graft.ms.linalg.NumpyRandom
import org.scalatest.funsuite.AnyFunSuite

class NumpyRandomSpec extends AnyFunSuite {

  test("matches numpy RandomState(123).random_sample exactly") {
    // Golden values from numpy (np.random.RandomState(123).random_sample(8))
    val expected = Array(
      0.6964691855978616, 0.28613933495037946, 0.2268514535642031,
      0.5513147690828912, 0.7194689697855631, 0.42310646012446096,
      0.9807641983846155, 0.6848297385848633)
    val rng = new NumpyRandom(123)
    expected.foreach(e => assert(rng.nextDouble() === e))
  }

  test("rand fills row-major like np.random.RandomState(123).rand(3, 2)") {
    val expected = Array(
      0.6964691855978616, 0.28613933495037946, 0.2268514535642031,
      0.5513147690828912, 0.7194689697855631, 0.42310646012446096)
    val rng = new NumpyRandom(123)
    assert(rng.rand(3, 2).sameElements(expected))
  }

  test("different seeds give different streams") {
    val a = new NumpyRandom(1).nextDouble()
    val b = new NumpyRandom(2).nextDouble()
    assert(a !== b)
  }
}
