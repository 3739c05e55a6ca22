package graft.functions

/** Sparse-vector pruning strategies, semantics transcribed from the
  * reference's `util/prune/PruneUtils.java` + `PruneType.java`:
  *   - top_k      (PruneUtils.java:34-64):   keep the k largest weights
  *   - max_ratio  (PruneUtils.java:74-92):   keep weights >= ratio * max
  *   - abs_value  (PruneUtils.java:104-121): keep weights >= threshold
  *   - alpha_mass (PruneUtils.java:133-166): keep the largest-weight prefix
  *     whose INCLUSIVE cumulative mass stays <= ratio * total — the crossing
  *     item is dropped, and nothing is kept when the single largest weight
  *     already exceeds ratio * total (no first-element special case)
  * `split` (PruneUtils.splitSparseVector:189-199) returns (kept, pruned) —
  * used by sparse two-phase and SEISMIC summary pruning.
  */
object PruneUtils extends Serializable {

  sealed trait PruneType { def name: String }
  case object TopK extends PruneType { val name = "top_k" }
  case object MaxRatio extends PruneType { val name = "max_ratio" }
  case object AbsValue extends PruneType { val name = "abs_value" }
  case object AlphaMass extends PruneType { val name = "alpha_mass" }
  case object NoPrune extends PruneType { val name = "none" }

  def pruneType(name: String): PruneType = name match {
    case "top_k"      => TopK
    case "max_ratio"  => MaxRatio
    case "abs_value"  => AbsValue
    case "alpha_mass" => AlphaMass
    case "none"       => NoPrune
    case other => throw new IllegalArgumentException(s"unknown prune type: $other")
  }

  /** Returns (kept, pruned). Deterministic: ties broken by token asc so the
    * same input always yields the same split on any partitioning. */
  def split(vec: Map[String, Float], t: PruneType, ratio: Float): (Map[String, Float], Map[String, Float]) = {
    if (vec == null || vec.isEmpty) return (Map.empty, Map.empty)
    t match {
      case NoPrune => (vec, Map.empty)
      case TopK =>
        val k = ratio.toInt
        val sorted = vec.toSeq.sortBy { case (tok, w) => (-w, tok) }
        (sorted.take(k).toMap, sorted.drop(k).toMap)
      case MaxRatio =>
        val mx = vec.valuesIterator.max
        val (keep, drop) = vec.partition { case (_, w) => w >= ratio * mx }
        (keep, drop)
      case AbsValue =>
        val (keep, drop) = vec.partition { case (_, w) => w >= ratio }
        (keep, drop)
      case AlphaMass =>
        // Reference accumulates in float and keeps entries while the running
        // prefix sum stays <= alpha * total (PruneUtils.java:134-161) — no
        // special case for the first element.
        val sorted = vec.toSeq.sortBy { case (tok, w) => (-w, tok) }
        val total = sorted.iterator.map(_._2.toDouble).sum.toFloat
        val keep = Map.newBuilder[String, Float]
        val drop = Map.newBuilder[String, Float]
        var topSum = 0f
        sorted.foreach { case (tok, w) =>
          topSum += w
          if (topSum <= ratio * total) keep += (tok -> w) else drop += (tok -> w)
        }
        (keep.result(), drop.result())
    }
  }

  def prune(vec: Map[String, Float], t: PruneType, ratio: Float): Map[String, Float] =
    split(vec, t, ratio)._1

  def validRatio(t: PruneType, ratio: Float): Boolean = t match {
    case TopK      => ratio >= 1f && ratio == ratio.toInt.toFloat
    case MaxRatio  => ratio >= 0f && ratio < 1f
    case AbsValue  => ratio >= 0f
    case AlphaMass => ratio >= 0f && ratio <= 1f
    case NoPrune   => true
  }
}
