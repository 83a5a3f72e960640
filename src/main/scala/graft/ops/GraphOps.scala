package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over near-duplicate PAIR sets — the step
  * a dedup pipeline needs between pair generation (MinHash/SimHash/cosine
  * LSH) and "keep one document per duplicate cluster": pairs only relate two
  * docs at a time, but transitively-linked docs form one cluster with one
  * canonical survivor.
  *
  * Algorithm: iterative min-label propagation to a fixpoint — each node
  * adopts the minimum component id among itself and its neighbors; after at
  * most diameter(G) rounds every node carries the minimum id of its
  * component (the deterministic canonical representative). Each round is
  * one join + one aggregation; duplicate-cluster graphs are shallow (near
  * -dup clusters are dense, diameter is small), so rounds stay in single
  * digits at any corpus size. The label table carries (id, component) only —
  * two fixed-width columns through every shuffle.
  */
object GraphOps {

  /** (a, b) pairs → (id, component) for every node appearing in a pair;
    * component = min node id of the connected component.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node takes min(own component, neighbors' components)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.select("id", "component").unionByName(viaNeighbors)
        .groupBy("id").agg(min("component").as("component"))
        .cache()
      val changed = next.alias("n")
        .join(labels.alias("l"), col("n.id") === col("l.id"))
        .filter(col("n.component") =!= col("l.component"))
        .limit(1).count() // any-change probe, stops at the first hit
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
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
