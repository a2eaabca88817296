package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.queries.TrainingDataQueries

/** Stage-decomposed timing probe for the incremental survivors fold
  * (dd_survivors_incr) at sf0.1: one cold pass (index bootstrap + fold),
  * then the warm fold broken into its stages. Replicates the fold body
  * with the catalog's own parameters (read from the memoized SurvivorIndex) — evidence for the
  * BASELINE.md note that the warm fold's wall time at bench scale is the
  * contracted-CC fixed round cost, not corpus-proportional work. */
object IncrSurvProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    time("warmup")(TrainingDataQueries.ddSurvivorsIncr(spark, dir).count())
    Dedup.releaseSignatures()
    // decompose: re-run the fold body with stage counts
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val idx = time("idx_lookup")(TrainingDataQueries.survivorIndexShared(spark, dir))
    // split predicate and ALL parameters come from the catalog/index —
    // the probe cannot silently measure a different query after a retune
    val batch = docs.where(TrainingDataQueries.incrIsNewDoc)
    val bHashed = batch.select(col("doc_id").cast("long").as("id"), md5(col("text").cast("binary")).as("content_hash"))
    val bSigs = Dedup.minhashSigs(batch, "doc_id", "text", idx.shingleK, idx.nHashes).cache()
    time("b_sigs")(bSigs.count())
    val bGroups = bHashed.groupBy("content_hash").agg(min("id").as("bmin"), count(lit(1)).as("bsz"))
    val sGroups = idx.groups.select(col("content_hash"), col("gmin").as("smin"), col("gsz").as("ssz"))
    val merged = sGroups.join(bGroups, Seq("content_hash"), "full_outer")
      .select(col("content_hash"), least(col("smin"), col("bmin")).as("gmin"),
        (coalesce(col("ssz"), lit(0L)) + coalesce(col("bsz"), lit(0L))).as("gsz"), col("smin")).cache()
    time("merged_groups")(merged.count())
    val eBatch = bHashed.join(merged, Seq("content_hash")).where(col("id") =!= col("gmin"))
      .select(col("id").as("a"), col("gmin").as("b"))
    val eRelink = merged.where(col("smin").isNotNull && col("smin") =!= col("gmin"))
      .select(col("smin").as("a"), col("gmin").as("b"))
    val allSigs = idx.sigs.unionByName(bSigs)
    val banded = Dedup.capBuckets(
      Dedup.bandedSigs(allSigs, idx.nHashes / idx.rowsPerBand, idx.rowsPerBand), idx.maxBucket)
    val bandedBatch = banded.join(bSigs.select("id"), Seq("id"), "left_semi")
    val near = bandedBatch.select(col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
      .join(banded.select(col("bucket"), col("id").as("id_b"), col("sig").as("sig_b")), Seq("bucket"))
      .where(col("id_a") =!= col("id_b"))
      .withColumn("est_jaccard", expr(
        s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / cast(${idx.nHashes} as double)"))
      .where(col("est_jaccard") >= idx.minJaccard)
      .select(least(col("id_a"), col("id_b")).as("a"), greatest(col("id_a"), col("id_b")).as("b"))
      .dropDuplicates("a", "b")
    val edges = eBatch.unionByName(eRelink).unionByName(near).cache()
    time("edges")(edges.count())
    val c2 = time("incr_cc")(
      { val c = graft.er.Clustering.incrementalClusters(spark, idx.clusters, edges).cache(); c.count(); c })
    time("tier_pass")(
      idx.hashed.unionByName(bHashed)
        .join(merged.select(col("content_hash"), col("gsz")), Seq("content_hash"))
        .select(col("id"), (col("gsz") > 1).as("has_exact"))
        .join(c2, Seq("id"), "left").count())
    spark.stop()
  }
}
