package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  *  - `localCheckpoint` after every round truncates lineage; without it
  *    the plan doubles per iteration and the job DAG explodes.
  *  - The convergence probe is a driver-side `isEmpty` on the changed-set
  *    (bounded: stops at the first changed row) — the only driver action,
  *    once per round.
  */
object ConnectedComponents {

  /** @param vertices one column `id` (distinct vertex ids; vertices with
    *                 no edges become singleton clusters)
    * @param edges    two columns `a`, `b` (undirected; null endpoints are
    *                 dropped — a null id joins nothing, SQL semantics)
    * @return (id, label) where label = min vertex id of the component
    */
  def components(vertices: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val e = edges.filter(col("a").isNotNull && col("b").isNotNull)
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
      .distinct()
      .localCheckpoint() // candidate generation (LSH etc.) runs ONCE, not per round

    var labels = vertices.select(col("id"), col("id").as("label"))
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val msgs = sym.join(labels, sym("u") === labels("id"))
        .select(col("v").as("id"), col("label"))
      val next = labels.union(msgs)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      converged = next.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .where(col("n.label") < col("o.label"))
        .isEmpty
      labels = next
      round += 1
    }
    labels
  }
}
