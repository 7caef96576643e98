package graft.ms.linalg

/** Mersenne-Twister (MT19937) with NumPy's legacy `RandomState` seeding and
  * double generation, so that seeded factor initialisation reproduces the
  * reference pipeline bit-for-bit (reference seeds np.random with 123:
  * decompose_parafac.py:299, 456 and derives PARAFAC init factors from
  * RandomState.random_sample via tensorly's initialize_factors).
  *
  * Algorithm constants are the published MT19937 reference values
  * (Matsumoto & Nishimura 1998); NumPy's integer seeding path is
  * init_genrand(19650218) followed by init_by_array([seed]).
  */
final class NumpyRandom(seed: Long) {
  private val N = 624
  private val mt = new Array[Int](N)
  private var mti = N + 1

  // numpy RandomState(int) seeds with plain init_genrand(seed)
  initGenrand(seed & 0xffffffffL)

  private def initGenrand(s: Long): Unit = {
    mt(0) = (s & 0xffffffffL).toInt
    var i = 1
    while (i < N) {
      val prev = mt(i - 1) & 0xffffffffL
      mt(i) = ((1812433253L * (prev ^ (prev >>> 30)) + i) & 0xffffffffL).toInt
      i += 1
    }
    mti = N
  }

  /** Next 32-bit output, as an unsigned value in a Long. */
  def nextUInt32(): Long = {
    if (mti >= N) {
      val mag01 = Array(0, 0x9908b0df)
      var kk = 0
      while (kk < N - 397) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk + 397) ^ (y >>> 1) ^ mag01(y & 1)
        kk += 1
      }
      while (kk < N - 1) {
        val y = (mt(kk) & 0x80000000) | (mt(kk + 1) & 0x7fffffff)
        mt(kk) = mt(kk + (397 - N)) ^ (y >>> 1) ^ mag01(y & 1)
        kk += 1
      }
      val y = (mt(N - 1) & 0x80000000) | (mt(0) & 0x7fffffff)
      mt(N - 1) = mt(396) ^ (y >>> 1) ^ mag01(y & 1)
      mti = 0
    }
    var y = mt(mti); mti += 1
    y ^= (y >>> 11)
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^= (y >>> 18)
    y & 0xffffffffL
  }

  /** numpy random_sample: 53-bit double in [0, 1). */
  def nextDouble(): Double = {
    val a = nextUInt32() >>> 5 // 27 bits
    val b = nextUInt32() >>> 6 // 26 bits
    (a * 67108864.0 + b) / 9007199254740992.0
  }

  /** Row-major (C-order) matrix of random_sample values — numpy rand(r, c). */
  def rand(rows: Int, cols: Int): Array[Double] =
    Array.fill(rows * cols)(nextDouble())
}
