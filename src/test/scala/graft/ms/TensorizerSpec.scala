package graft.ms

import graft.ms.ops.Tensorizer
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

class TensorizerSpec extends AnyFunSuite {

  private def resource(name: String): Seq[Array[String]] = {
    val src = Source.fromInputStream(getClass.getResourceAsStream(name))
    try src.getLines().filter(_.nonEmpty).map(_.split(",")).toSeq
    finally src.close()
  }

  test("greedy ppm partitioner matches the reference's 80-row golden data") {
    // fixture from the reference's own test_mz_partitioning
    // (generate_slice_tensor.py:383-563); columns:
    // input:    level,rt,mz,swath_upper,sample_no,spectrum_index,intensity
    // expected: mz_partition_start,level,rt,mz,...
    val input = resource("/mz_partition_input.csv")
    val expected = resource("/mz_partition_expected.csv")
    assert(input.size == 80 && expected.size == 80)

    val mzs = input.map(_(2).toDouble)
    val starts = Tensorizer.partitionStarts(mzs.distinct.sorted, 40.0).toIndexedSeq

    // NOTE on fidelity: the reference's own assertion is a no-op (the
    // np.allclose at generate_slice_tensor.py:562-563 is unasserted) and
    // one golden label (1249.6247558594) is stale — it is smaller than
    // every m/z in its group, violating the documented "label = partition
    // minimum" contract (:184). We therefore assert the GROUPING
    // structure against the golden data, and the minimum-label contract
    // independently.
    val gotGroups = mzs.distinct.sorted
      .groupBy(mz => Tensorizer.assignPartition(starts, mz))
      .values.map(_.toSet).toSet
    val expGroups = expected
      .groupBy(_(0)) // golden label column
      .values.map(_.map(_(3).toDouble).toSet).toSet
    assert(gotGroups == expGroups, "partition grouping differs from golden")

    // 8 distinct partitions, and each label is its group's minimum
    assert(starts.size == expected.map(_(0)).distinct.size)
    gotGroups.foreach { group =>
      val lbl = Tensorizer.assignPartition(starts, group.head)
      assert(lbl == group.min)
    }
  }

  test("partitioner invariants (FIXTURES.md §5)") {
    val mzs = Seq(100.0, 100.001, 100.002, 100.01, 100.02, 200.0, 200.004)
    val starts = Tensorizer.partitionStarts(mzs, 40.0).toIndexedSeq
    // labels are partition minima, ascending
    assert(starts == starts.sorted)
    assert(starts.forall(mzs.contains))
    // every mz maps to a start at distance within accumulated tolerance
    mzs.foreach { mz =>
      val s = Tensorizer.assignPartition(starts, mz)
      assert(s <= mz)
    }
    // ppm 40 of 100 = 0.004: 100.0, 100.001, 100.002 together; 100.01 new
    assert(Tensorizer.assignPartition(starts, 100.002) == 100.0)
    assert(Tensorizer.assignPartition(starts, 100.01) == 100.01)
    assert(Tensorizer.assignPartition(starts, 200.004) == 200.0)
  }

  test("cycle binning: [closed, open) bins from MS1 times, +0.1 closes last") {
    val ms1 = IndexedSeq(10.0, 20.0, 30.0)
    assert(Tensorizer.cycleOf(ms1, 9.99) == -1) // before first MS1 → dropped
    assert(Tensorizer.cycleOf(ms1, 10.0) == 0)
    assert(Tensorizer.cycleOf(ms1, 19.999) == 0)
    assert(Tensorizer.cycleOf(ms1, 20.0) == 1)
    assert(Tensorizer.cycleOf(ms1, 30.0) == 2)
    assert(Tensorizer.cycleOf(ms1, 30.05) == 2) // inside the +0.1 closure
    assert(Tensorizer.cycleOf(ms1, 30.1) == -1) // outside → dropped tail
  }

  test("resurrected tensorize golden (generate_slice_tensor.py:321-380)") {
    // Two samples; file=1 has two cycles, file=2 has two cycles.
    def p(file: String, idx: Int, rt: Double, mz: Double, i: Double, lvl: Int) =
      AdjustedPeak(file, idx, lvl, rt.toFloat, mz.toFloat, i.toFloat,
        0f, 0f, 0f, 0)
    val rows = Seq(
      p("1", 123, 1.01, 10, 100, 1), p("1", 124, 1.02, 20, 200, 2),
      p("1", 345, 3.02, 30, 300, 1), p("1", 346, 3.03, 30, 333, 2),
      p("2", 347, 2.01, 11, 400, 1), p("2", 348, 2.06, 22, 500, 2),
      p("2", 349, 2.07, 22, 800, 1), p("2", 350, 2.08, 33, 600, 2))

    // At the production threshold (max cycles ≥ 5) this toy slice is
    // erased entirely — as it would be in the reference (its own
    // remove_infrequent_points would drop every partition, which is why
    // the reference test stayed disabled).
    val result = Tensorizer.tensorize("0.00", 0, rows.iterator, mzTolPpm = 40.0)
    assert(result == Left(Tensorizer.TooFewPoints))

    // The golden arrays themselves, asserted verbatim with the filter
    // disabled (minPointsPerSample = 1): exact expected m/z indices and
    // the 2×2×8 NaN-patterned tensor. Two conventions differ from the
    // reference text, neither changing a value: labels carry 4 decimals
    // (the engine's pyFormat convention; the reference test passed
    // mz_decimals=10), and the sample axis is SORTED by file name
    // ("1" then "2"), where the reference's glob order happened to list
    // file=2 first — its expected_tensor[0] is our sample 1, row for
    // row.
    val st = Tensorizer
      .tensorize("0.00", 0, rows.iterator, 40.0, minPointsPerSample = 1)
      .getOrElse(fail("tensorize failed on the toy golden"))

    assert(st.samples == Seq("1", "2"))
    assert(st.n_samples == 2 && st.n_cycles == 2 && st.n_mz == 8)
    // expected_mz_indices, generate_slice_tensor.py:341-348
    assert(st.mz_indices == Seq(
      "10.0000_ms1", "11.0000_ms1", "22.0000_ms1", "30.0000_ms1",
      "20.0000_ms2", "22.0000_ms2", "30.0000_ms2", "33.0000_ms2"))

    // expected_tensor, generate_slice_tensor.py:350-355 (reference
    // rows: file=2 block first; here file=1 first by sorted samples)
    val n = Float.NaN
    val expected: Array[Array[Array[Float]]] = Array(
      Array( // sample "1"
        Array(100f, n, n, n, 200f, n, n, n),
        Array(n, n, n, 300f, n, n, 333f, n)),
      Array( // sample "2"
        Array(n, 400f, n, n, n, 500f, n, n),
        Array(n, n, 800f, n, n, n, n, 600f)))
    for (s <- 0 until 2; c <- 0 until 2; m <- 0 until 8) {
      val exp = expected(s)(c)(m)
      val got = st(s, c, m)
      assert((exp.isNaN && got.isNaN) || exp == got,
        s"tensor[$s][$c][$m]: expected $exp, got $got")
    }
  }

  test("tensorize end-to-end on a slice that survives the frequency filter") {
    // one MS1 + one MS2 m/z per sample, 6 cycles ⇒ passes max-count ≥ 5
    def mk(file: String, base: Int): Seq[AdjustedPeak] =
      (0 until 6).flatMap { c =>
        val rt = 10.0 + c
        Seq(
          AdjustedPeak(file, base + 2 * c, 1, rt.toFloat, 100.0f,
            (base + c).toFloat, 0f, 0f, 0f, 0),
          AdjustedPeak(file, base + 2 * c + 1, 2, (rt + 0.05).toFloat, 200.0f,
            (2 * (base + c)).toFloat, 0f, 0f, 0f, 0))
      }
    val rows = mk("a", 100) ++ mk("b", 500)
    val st = Tensorizer.tensorize("0.00", 0, rows.iterator, 40.0)
      .getOrElse(fail("tensorize failed"))

    assert(st.samples == Seq("a", "b"))
    assert(st.n_samples == 2 && st.n_cycles == 6 && st.n_mz == 2)
    assert(st.mz_indices == Seq("100.0000_ms1", "200.0000_ms2"))
    // sample a, cycle 0: MS1 intensity 100, MS2 200
    assert(st(0, 0, 0) == 100f && st(0, 0, 1) == 200f)
    // sample b, cycle 5: MS1 505, MS2 1010
    assert(st(1, 5, 0) == 505f && st(1, 5, 1) == 1010f)
  }

  test("label formatting matches Python half-even ties") {
    // 100.03125 is exactly representable: Python "{:.4f}" → 100.0312
    // (half-even), Java "%.4f" would give 100.0313 (half-up)
    assert(Tensorizer.pyFormat(100.03125, 4) == "100.0312")
    assert(Tensorizer.pyFormat(100.09375, 4) == "100.0938") // rounds up to even
    assert(Tensorizer.label(100.03125, 2) == "100.0312_ms2")
    assert(Tensorizer.swathKey(440.125) == "440.12")
  }

  test("mz index label format and ordering") {
    assert(Tensorizer.label(350.1284179688, 2) == "350.1284_ms2")
    assert(Tensorizer.parseLabel("350.1284_ms2") == ((2, 350.1284)))
    val labels = Seq("30.0000_ms2", "10.0000_ms1", "22.0000_ms1", "20.0000_ms2")
    assert(labels.sortBy(Tensorizer.parseLabel) ==
      Seq("10.0000_ms1", "22.0000_ms1", "20.0000_ms2", "30.0000_ms2"))
  }

  test("empty MS level is an error") {
    val rows = (0 until 6).map { c =>
      AdjustedPeak("a", c, 1, (10.0 + c).toFloat, 100f, 1f, 0f, 0f, 0f, 0)
    }
    assert(Tensorizer.tensorize("0.00", 0, rows.iterator, 40.0) ==
      Left(Tensorizer.EmptyMsLevel(2)))
  }
}
