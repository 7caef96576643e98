package graft.ms

/** Core data model of the mass-spec engine (SURVEY.md §1).
  *
  * Column names mirror the reference's canonical peak-table schema
  * (reference msproc.py:35-42, split_csv_maps_to_slices.py:52-59) so
  * DataFrames round-trip between the relational spine and the typed ops.
  */

/** One (m/z, intensity) point of one spectrum, after SWATH adjustment
  * (stage-2 output schema, adjust_swaths.R:43-53) plus the slicing
  * columns `file` and `rt_window` (split_csv_maps_to_slices.py:78-84). */
final case class AdjustedPeak(
    file: String,
    spectrum_index: Int,
    level: Int,
    rt: Float,
    mz: Float,
    intensity: Float,
    prec_mz: Float,
    swath_lower_adjusted: Float,
    swath_upper_adjusted: Float,
    rt_window: Int)

/** Dense (sample × cycle × m/z-partition) float32 tensor for one
  * (swath, rt-window) slice, NaN-padded to the longest sample's cycle
  * count (generate_slice_tensor.py:83-96). `data` is row-major
  * (C-order); identities that the reference kept in
  * tensor_properties.json are ordinary columns here. */
final case class SliceTensor(
    swath_key: String, // "%.2f" of swath_lower_adjusted — the partition key
    rt_window: Int,
    samples: Seq[String], // sorted; tensor sample axis order
    mz_indices: Seq[String], // "%.4f_ms<level>", sorted by (level, mz)
    n_samples: Int,
    n_cycles: Int,
    n_mz: Int,
    data: Array[Float]) {
  def apply(s: Int, t: Int, m: Int): Float = data((s * n_cycles + t) * n_mz + m)
}

/** Kruskal factors of one (slice, F) decomposition plus its quality log
  * (replaces the reference's parafac_model_F<ncomp>.pt +
  * decomp_measures.csv pair, decompose_parafac.py:255-257, 358-372).
  * Factor matrices are row-major flat float32. */
final case class ParafacModelRow(
    swath_key: String,
    rt_window: Int,
    ncomp: Int,
    n_samples: Int,
    n_cycles: Int,
    n_mz: Int,
    samples: Seq[String],
    mz_indices: Seq[String],
    sample_mode: Array[Float], // S × F
    time_mode: Array[Float], // T × F
    mass_mode: Array[Float], // M × F
    rsq: Double,
    iterations: Int)

/** Per-component peak count of a model's time mode
  * (collect_time_mode_values.py:72-76). */
final case class ComponentPeaks(
    swath_key: String,
    rt_window: Int,
    ncomp: Int,
    comp_num: Int,
    npeaks: Int)
