package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Checkpoints

/** Distributed connected components by iterative min-label propagation —
  * the step that turns near-duplicate candidate PAIRS (MinHash/SimHash
  * LSH output) into dedup GROUPS: every document gets the smallest doc id
  * of its component as `cluster_id`, and "keep one per cluster" becomes a
  * trivial filter.
  *
  * Algorithm: each round, every vertex takes the minimum label among
  * itself and its neighbors; converged when no label changes. Rounds
  * needed = the longest shortest-path distance from a component's minimum
  * vertex to any member. Near-dup components are overwhelmingly shallow
  * (duplicates of one source document), so this converges in a handful of
  * rounds; for adversarially deep graphs the same loop body accepts the
  * large-star/small-star edge rewriting (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") which bounds rounds at O(log² n).
  *
  * Scale design:
  *  - Per round: ONE shuffle join (edges ⋈ labels on the edge source) and
  *    one min-aggregate — both hash-partitioned on vertex id, so at
  *    1000 executors each round is a single co-partitioned pass over the
  *    edge list. No adjacency lists are ever materialized per-vertex.
  *  - [[graft.core.Checkpoints.pin]] after every round truncates
  *    lineage; without it the plan doubles per iteration and the job DAG
  *    explodes. Local (executor-memory) by default; set
  *    `spark.graft.checkpointDir` to a reliable directory for
  *    fault-tolerant multi-hour runs — both modes are bit-identical
  *    (`CheckpointModeSpec`).
  *  - The convergence probe is a driver-side `isEmpty` on the changed-set
  *    (bounded: stops at the first changed row) — the only driver action,
  *    once per round.
  */
object ConnectedComponents {

  /** @param vertices one column `id` (distinct vertex ids; vertices with
    *                 no edges become singleton clusters). Defines the
    *                 output domain exactly: ids appearing only in `edges`
    *                 conduct connectivity but are not returned.
    * @param edges    two columns `a`, `b` (undirected; null endpoints are
    *                 dropped — a null id joins nothing, SQL semantics)
    * @return (id, label) where label = min vertex id of the component
    * @throws IllegalStateException if not converged within maxIter rounds
    *         (rounds ≈ component depth here; use
    *         [[componentsAlternating]] for adversarially deep graphs)
    */
  def components(vertices: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val e = edges.filter(col("a").isNotNull && col("b").isNotNull)
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
      .distinct()
      .transform(Checkpoints.pin) // candidate generation (LSH etc.) runs ONCE, not per round

    // Loop state carries THREE columns: (id, label, old) where old is the
    // id's label at the start of the round (null if the id just entered
    // via an edge-only neighbor). That makes the convergence probe a
    // filter over the already-checkpointed round result — the earlier
    // form re-joined next⋈labels per round, a full extra shuffle that
    // existed only to answer "did anything change".
    var labels = vertices.select(col("id"), col("id").as("label"),
      col("id").as("old"))
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // Frontier messaging: only ids whose label CHANGED last round (or
      // just appeared) send. A vertex with a stable label already sent
      // that label to every neighbor the round it acquired it, so
      // re-sending is pure waste; on shallow near-dup graphs the
      // frontier collapses after round one and AQE broadcasts it,
      // turning later rounds into scan-only passes over the edge list.
      val frontier =
        if (round == 0) labels.select(col("id"), col("label"))
        else labels.where(col("old").isNull || col("label") < col("old"))
          .select(col("id"), col("label"))
      val msgs = sym.join(frontier, sym("u") === frontier("id"))
        .select(col("v").as("id"), col("label"), lit(null).cast(labels.schema("old").dataType).as("old"))
      // one id contributes exactly one "old" row (labels has unique ids),
      // so min(old) recovers it; null-only groups are new ids
      val next = labels.select(col("id"), col("label"), col("label").as("old"))
        .union(msgs)
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"), min(col("old")).as("old"))
        .transform(Checkpoints.pin)
      converged = next.where(col("old").isNull || col("label") < col("old")).isEmpty
      labels = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds; " +
          "raise maxIter or use componentsAlternating for deep graphs")
    // restrict to the declared vertex domain (edge-only ids conducted
    // labels above but are not part of the output contract)
    labels.select(col("id"), col("label"))
      .join(vertices.select(col("id")), Seq("id"), "left_semi")
  }

  /** Same contract as [[components]], but via alternating large-star /
    * small-star edge rewriting (Kiveris et al., "Connected Components in
    * MapReduce and Beyond"), which converges in O(log² n) rounds even on
    * path/tree graphs where plain label propagation needs O(diameter)
    * rounds — the scale path for adversarially deep graphs.
    *
    *  - large-star: every neighbor v > u's current minimum m(u) re-links
    *    to m(u); small-star: every neighbor v ≤ u re-links to m(u).
    *    Both are one groupBy over the edge list (min + collect of the
    *    star) — same shuffle shape per round as [[components]], but the
    *    *edge set itself* contracts toward star graphs, so rounds are
    *    polylog instead of linear in depth.
    *  - Iteration state is only the rewritten edge list; converged when
    *    the edge set no longer changes (every edge then points directly
    *    at its component minimum).
    */
  def componentsAlternating(vertices: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // Parent-pointer form: every edge oriented larger → smaller.
    val e0 = edges.filter(col("a").isNotNull && col("b").isNotNull)
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .transform(Checkpoints.pin)

    // large-star(u): m = min(N(u) ∪ {u}); re-link every neighbor v > u to
    // m. Join-based (per-center min, then join back) — a hot center never
    // materializes its star as one array row, so degree skew costs only
    // a skewed-join (AQE-splittable), not a single giant record.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u").as("c"), least(col("mn"), col("u")).as("m"))
      sym.join(mins, sym("u") === mins("c"))
        .filter(col("v") > col("u")) // v > u ≥ m ⇒ (v, m) already oriented
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // small-star(u) over larger→smaller edges: m = min(N(u)) (all
    // neighbors are < u); re-link every smaller neighbor AND u itself
    // to m — dropping the (u, m) link would disconnect the center.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("u")).agg(min(col("v")).as("mn"))
      val relinked = e.join(mins, Seq("u"))
        .filter(col("v") =!= col("mn"))
        .select(col("v").as("u"), col("mn").as("v")) // v > mn by minimality
      relinked.union(mins.select(col("u"), col("mn").as("v")))
        .distinct()
    }

    var e = e0
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val next = Checkpoints.pin(smallStar(largeStar(e)))
      // both sides are distinct sets ⇒ equality = same size + one-sided
      // empty difference (one count + one bounded anti-join probe, not
      // two full exceptAll jobs per round)
      converged = next.count() == e.count() && next.exceptAll(e).isEmpty
      e = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"alternating connected components did not converge in $maxIter rounds")
    // Converged edge set is a collection of stars centered at component
    // minima — but a center can be an id that appears only in `edges`
    // (it conducts connectivity while being outside the output domain),
    // and the contract (same as [[components]]) is label = min VERTEX
    // id. So: resolve each vertex's star representative, then relabel
    // every component by the minimum vertex id it contains (one bounded
    // groupBy + join over the vertex set, not the edge list).
    val rep = vertices.select(col("id"))
      .join(e.select(col("u").as("id"), col("v").as("ptr")), Seq("id"), "left_outer")
      .groupBy(col("id")).agg(coalesce(min(col("ptr")), first(col("id"))).as("rep"))
    val minVertex = rep.groupBy(col("rep")).agg(min(col("id")).as("label"))
    rep.join(minVertex, Seq("rep")).select(col("id"), col("label"))
  }
}
