package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over near-duplicate PAIR sets — the step
  * a dedup pipeline needs between pair generation (MinHash/SimHash/cosine
  * LSH) and "keep one document per duplicate cluster": pairs only relate two
  * docs at a time, but transitively-linked docs form one cluster with one
  * canonical survivor.
  *
  * Algorithm: min-label propagation with pointer jumping (shortcutting) —
  * each round a node first adopts the minimum component id among itself and
  * its neighbors, then jumps to its component's component
  * (comp := comp(comp)). Neighbor propagation alone needs diameter(G)
  * rounds; the jump doubles the distance a minimum label has travelled each
  * round, so a fixpoint is reached in O(log diameter) rounds — a
  * 2^40-node chain converges inside the default maxIter. Non-convergence
  * THROWS rather than returning split components: a dedup pipeline fed
  * partial labels would silently keep several "canonical" survivors of one
  * duplicate cluster. The label table carries (id, component) only — two
  * fixed-width columns through every shuffle.
  */
object GraphOps {

  /** (a, b) pairs → (id, component) for every node appearing in a pair;
    * component = min node id of the connected component.
    *
    * @throws IllegalStateException if a fixpoint is not reached in `maxIter`
    *         rounds (needs ~log2(diameter) + 2; default 50 covers any graph
    *         that fits in storage).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .cache()
    // localCheckpoint (not cache) each round: labels feeds into itself twice
    // per iteration, so without lineage truncation the logical plan doubles
    // every round and the driver OOMs just rendering it by ~iteration 10.
    // On a real cluster swap for reliable checkpointing (sc.setCheckpointDir
    // + .checkpoint()) to also get executor-loss fault tolerance.
    // Seed = min(own id, min neighbor id): the first neighbor-propagation
    // round folded into the init aggregate — one round (and its jobs) saved
    // on every graph; cliques (the dedup common case) then converge on the
    // first loop iteration's no-change probe.
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min("dst").as("__mn"))
      .select(col("id"), least(col("id"), col("__mn")).as("component"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node takes min(own component, neighbors' components); the
      // labels row also CARRIES its previous component (`__old`) through
      // the aggregate — max over exactly one non-null — so the convergence
      // probe below is a scan of the checkpointed output instead of a
      // join-with-shuffle of next vs labels per round
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("component"))
      // lazy cache (not an eager checkpoint): propagated is consumed twice
      // by the jump join below, and its lineage is already shallow because
      // `labels` is truncated — one materialization job per round, not two
      val propagated = labels
        .select(col("id"), col("component"), col("component").as("__old"))
        .unionByName(viaNeighbors.withColumn("__old",
          lit(null).cast(labels.schema("component").dataType)))
        .groupBy("id").agg(min("component").as("component"), max("__old").as("__old"))
        .cache()
      // pointer jump: component ids are node ids, so resolve one more hop
      // (comp(comp(u))) — this is what makes long chains converge in
      // logarithmic rounds instead of linear
      val next = propagated.alias("n")
        .join(propagated.select(col("id").as("component"),
          col("component").as("component2")).alias("p"), Seq("component"), "left_outer")
        .select(col("id"), coalesce(col("component2"), col("component")).as("component"),
          col("__old"))
        .localCheckpoint(true)
      val changed = next.filter(col("component") =!= col("__old"))
        .limit(1).count() // any-change probe over checkpointed rows, no join
      propagated.unpersist()
      labels = next.select("id", "component")
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter (rounds needed ≈ log2(component diameter) + 2)")
    }
    labels
  }

  /** Near-duplicate dedup: given docs and their near-dup pairs, keep ONE doc
    * per duplicate cluster (the minimum id) plus every unpaired doc. Returns
    * (id, keep, component): `keep` marks the canonical survivor.
    */
  def dedupByPairs(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val comps = connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
    docs.select(col(idCol))
      .join(comps, Seq(idCol), "left_outer")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .withColumn("keep", col(idCol) === col("component"))
  }
}
