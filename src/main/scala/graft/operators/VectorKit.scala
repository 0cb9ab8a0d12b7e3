package graft.operators

/** Cross-engine-deterministic vector primitives over `array<float>`
  * embedding columns, emitted as Spark SQL and DuckDB SQL snippets.
  *
  * Determinism contract: every float is widened to double BEFORE any
  * arithmetic, and every reduction is a strict left fold in index order
  * (Spark `aggregate`, DuckDB `list_reduce`), so dot products, norms and
  * cosines are bit-identical in both engines and under any partitioning.
  * sqrt and a single division are correctly-rounded IEEE-754 ops.
  *
  * Scale notes: these are narrow per-row expressions. The similarity
  * *queries* built on them follow the distributed ANN layouts: broadcast
  * the (small) query set and stream the corpus once for brute-force
  * top-k; bucket/probe joins (sign-LSH, IVF) for the candidate-bounded
  * paths — never an unbounded corpus × corpus product.
  */
object VectorKit {

  /** dot(a, b) as a left fold over element products (doubles). Engine
    * side: native codegen'd kernel (graft.functions.VecDot), bit-
    * identical to the portable HOF fold (dotSparkHof, kept for the
    * equivalence spec).
    */
  def dotSpark(a: String, b: String): String = s"graft_vec_dot($a, $b)"
  def dotSparkHof(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (zx, zy) -> CAST(zx AS DOUBLE) * CAST(zy AS DOUBLE)), CAST(0.0 AS DOUBLE), (dp_acc, dp_v) -> dp_acc + dp_v)"
  def dotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len($a) + 1), dp_i -> CAST($a[dp_i] AS DOUBLE) * CAST($b[dp_i] AS DOUBLE))), (dp_x, dp_y) -> dp_x + dp_y)"

  /** Squared L2 distance between the 1-based windows
    * `[off+1, off+len]` of two vectors — the subspace metric product
    * quantization encodes/serves with. Same determinism contract as
    * [[dotSpark]]/[[dotDuck]]: every element widened to double, the
    * diff squared with identical IEEE ops, reduced by a strict left
    * fold in index order, so both engines produce bit-identical
    * distances.
    */
  def l2SubSpark(a: String, b: String, off: Int, len: Int): String =
    s"graft_vec_l2sub($a, $b, $off, $len)"
  def l2SubSparkHof(a: String, b: String, off: Int, len: Int): String =
    s"aggregate(zip_with(slice($a, ${off + 1}, $len), slice($b, ${off + 1}, $len), " +
      s"(lx, ly) -> (CAST(lx AS DOUBLE) - CAST(ly AS DOUBLE)) * (CAST(lx AS DOUBLE) - CAST(ly AS DOUBLE))), " +
      s"CAST(0.0 AS DOUBLE), (l2_a, l2_v) -> l2_a + l2_v)"
  def l2SubDuck(a: String, b: String, off: Int, len: Int): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, ${len + 1}), " +
      s"l2_i -> (CAST($a[l2_i + $off] AS DOUBLE) - CAST($b[l2_i + $off] AS DOUBLE)) * " +
      s"(CAST($a[l2_i + $off] AS DOUBLE) - CAST($b[l2_i + $off] AS DOUBLE)))), (l2_x, l2_y) -> l2_x + l2_y)"

  /** Number of sign-random-projection hyperplanes (2^planes buckets). */
  val LshPlanes = 4

  /** Plane component r(j, i) = Knuth-hash of the flat index, scaled to
    * [-0.5, 0.5). Integers < 2^32 and the 2^-32 scale are exactly
    * representable, so the planes are bit-identical constants in both
    * engines — no RNG, no libm. Stride 64 matches the embedding dim
    * (components would repeat across planes past dim 64).
    */
  def planeComponent(plane: Int, i0: Int): Double =
    ((plane.toLong * 64 + i0) * 2654435761L % 4294967296L).toDouble / 4294967296.0 - 0.5

  /** Engine side: the plane is a literal double array (exact values,
    * Double.toString round-trips) dotted with the native kernel — same
    * multiply-then-fold order as the portable forms.
    */
  def projSpark(v: String, plane: Int): String = {
    val lits = (0 until 64).map(i0 => s"${planeComponent(plane, i0)}D").mkString(", ")
    s"graft_vec_dot($v, array($lits))"
  }
  def projDuck(v: String, plane: Int): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len($v) + 1), pr_i -> CAST($v[pr_i] AS DOUBLE) * (CAST((($plane * 64 + (pr_i - 1)) * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 - 0.5))), (pr_a, pr_b) -> pr_a + pr_b)"

  /** Sign-LSH bucket id in [0, 2^planes). `planes` defaults to the
    * catalog-pinned [[LshPlanes]]; scale paths pass a corpus-derived
    * count ([[graft.api.VectorSearch.lshNearDupsAuto]]) because FIXED
    * plane counts make bucket occupancy grow linearly with the corpus
    * and candidate pairs quadratically — the sf1 slope run measured
    * exactly that cliff.
    */
  def bucketSpark(v: String, planes: Int = LshPlanes): String =
    (0 until planes).map(j => s"(CASE WHEN ${projSpark(v, j)} > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
  def bucketDuck(v: String, planes: Int = LshPlanes): String =
    (0 until planes).map(j => s"(CASE WHEN ${projDuck(v, j)} > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")

  /** Sign-LSH bucket id for one AMPLIFICATION BAND: `planes` planes
    * drawn from the shared deterministic family starting at
    * `planeOffset`, so band b of width p uses planes [b*p, b*p + p) —
    * disjoint slices, hence independent hashes in the classic
    * OR-of-ANDs LSH amplification (Indyk–Motwani; Charikar's sign
    * hashes). A pair is a candidate if ALL planes of SOME band agree:
    * per-pair recall 1 - (1 - r^p)^bands for sign-agreement
    * probability r = 1 - θ/π, against each band's occupancy staying
    * ~n / 2^p.
    */
  def bucketSparkBand(v: String, planes: Int, planeOffset: Int): String =
    (0 until planes).map(j =>
      s"(CASE WHEN ${projSpark(v, planeOffset + j)} > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
}
