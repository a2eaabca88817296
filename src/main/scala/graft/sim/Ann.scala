package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *   - bruteForceTopK: exact baseline — broadcast the (small) query set,
  *     cosine against every corpus row, window top-k. One pass over the
  *     corpus, no corpus shuffle: at 100 TB this is the scan-everything
  *     floor the approximate path is measured against.
  *   - lshTopK: random-hyperplane bucket search — corpus and queries share
  *     sign-signature bands; only same-bucket candidates are scored. The
  *     scale path: candidate count per query is bounded by bucket sizes,
  *     not corpus size.
  *
  * Determinism: ties broken by ascending neighbor id everywhere.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query id (excluding self).
    * queries: subset of the corpus (same schema). */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("nbr_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine", Dedup.cosineCol(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"), col("cosine"))
  }

  /** LSH-bucketed ANN: candidates = corpus rows sharing at least one
    * signature band with the query; exact cosine re-rank inside the
    * candidate set. Larger nBits/bandBits → fewer, more precise candidates. */
  def lshTopK(
      spark: SparkSession,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 16,
      bandBits: Int = 4,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val planes = Array.tabulate(nBits, dim) { (b, d) =>
      (0 until 4).map(x =>
        (graft.synth.Synth.splitmix64(seed ^ (b * 1009L + d * 31L + x)) >>> 11)
          .toDouble / (1L << 53)).sum - 2.0
    }
    val planesB = spark.sparkContext.broadcast(planes)
    val nBands = nBits / bandBits

    def banded(df: DataFrame, ident: String): DataFrame =
      df.select(col(idCol).cast("long").as(ident), col(vecCol).cast("array<double>").as(ident + "_v"))
        .as[(Long, Seq[Double])]
        .map { case (id, v) =>
          val p = planesB.value
          var sig = 0L
          var b = 0
          while (b < p.length) {
            var dot = 0.0
            var d = 0
            while (d < v.length && d < p(b).length) { dot += v(d) * p(b)(d); d += 1 }
            if (dot > 0) sig |= (1L << b)
            b += 1
          }
          (id, v, sig)
        }
        .toDF(ident, ident + "_v", "sig")
        .select(
          col(ident), col(ident + "_v"),
          explode(expr(
            s"transform(sequence(0, ${nBands - 1}), b -> " +
              s"concat(cast(b as string), ':', cast((sig div shiftleft(1L, b * $bandBits)) % shiftleft(1L, $bandBits) as string)))"))
            .as("bucket"))

    val cb = banded(corpus, "nbr_id")
    val qb = banded(queries, "query_id")
    val cand = qb.join(cb, Seq("bucket"))
      .where(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("query_id_v"), col("nbr_id"), col("nbr_id_v"))
      .dropDuplicates("query_id", "nbr_id")
      .withColumn("cosine", Dedup.cosineCol(col("query_id_v"), col("nbr_id_v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    cand
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"), col("cosine"))
  }
}
