package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** U5 — the reference's train/dev/test dataset split (reference:
  * scripts/split_dataset.py:17-144): fixed dev/test article-id lists;
  * articles whose fixed id is missing from the corpus are FILLED UP from
  * the train pool after a seed-42 `random.shuffle` — replicated exactly
  * via the MT19937 port below (pinned against CPython vectors in
  * DatasetSplitSpec). Output order matches the reference's write order:
  * original dev/test ids first (in list order), then remaining articles
  * in shuffled order.
  *
  * Scale note: assignment + order are decided over the ID VECTOR alone
  * (8 bytes/article on the driver — the reference holds the full article
  * TEXT in driver memory; at 10^8 articles our id vector is ~1 GB where
  * the reference would need the whole dump). The join back to rows is a
  * distributed equi-join on id.
  */
object DatasetSplit {

  /** CPython's Mersenne Twister with int seeding (_randommodule.c
    * init_by_array / random_seed), enough for random.seed(int) +
    * random.shuffle parity. Public algorithm (Matsumoto & Nishimura). */
  final class PythonRandom(seed: Long) {
    private val N = 624
    private val mt = new Array[Int](N)
    private var mti = N + 1

    { // random.seed(42): key = abs(seed) as 32-bit little-endian words
      val a = math.abs(seed)
      val key =
        if (a == 0L) Array(0L)
        else Iterator.iterate(a)(_ >>> 32).takeWhile(_ != 0L).map(_ & 0xFFFFFFFFL).toArray
      initGenrand(19650218)
      var i = 1; var j = 0
      var k = math.max(N, key.length)
      while (k > 0) {
        mt(i) = (((mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1664525)) + key(j).toInt) + j)
        i += 1; j += 1
        if (i >= N) { mt(0) = mt(N - 1); i = 1 }
        if (j >= key.length) j = 0
        k -= 1
      }
      k = N - 1
      while (k > 0) {
        mt(i) = ((mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1566083941)) - i)
        i += 1
        if (i >= N) { mt(0) = mt(N - 1); i = 1 }
        k -= 1
      }
      mt(0) = 0x80000000
      mti = N
    }

    private def initGenrand(s: Int): Unit = {
      mt(0) = s
      var i = 1
      while (i < N) {
        mt(i) = 1812433253 * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i
        i += 1
      }
      mti = N
    }

    /** genrand_uint32 as unsigned in a Long. */
    def nextUInt32(): Long = {
      if (mti >= N) {
        val M = 397
        val UPPER = 0x80000000
        val LOWER = 0x7FFFFFFF
        var kk = 0
        while (kk < N - M) {
          val y = (mt(kk) & UPPER) | (mt(kk + 1) & LOWER)
          mt(kk) = mt(kk + M) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908B0DF else 0)
          kk += 1
        }
        while (kk < N - 1) {
          val y = (mt(kk) & UPPER) | (mt(kk + 1) & LOWER)
          mt(kk) = mt(kk + (M - N)) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908B0DF else 0)
          kk += 1
        }
        val y = (mt(N - 1) & UPPER) | (mt(0) & LOWER)
        mt(N - 1) = mt(M - 1) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908B0DF else 0)
        mti = 0
      }
      var y = mt(mti); mti += 1
      y ^= (y >>> 11)
      y ^= (y << 7) & 0x9D2C5680
      y ^= (y << 15) & 0xEFC60000
      y ^= (y >>> 18)
      y.toLong & 0xFFFFFFFFL
    }

    /** random.getrandbits(k) for 0 < k <= 32. CPython concatenates words
      * for k > 32; this port does not — fail loudly rather than silently
      * diverging (k > 32 needs collections beyond 2^31 elements). */
    def getrandbits(k: Int): Long = {
      require(k > 0 && k <= 32, s"getrandbits($k): only 1..32 supported")
      nextUInt32() >>> (32 - k)
    }

    /** random._randbelow(n) — rejection sampling. */
    def randbelow(n: Long): Long = {
      val k = 64 - java.lang.Long.numberOfLeadingZeros(n)
      var r = getrandbits(k.toInt)
      while (r >= n) r = getrandbits(k.toInt)
      r
    }

    /** random.shuffle — Fisher-Yates from the top. */
    def shuffle[T](xs: scala.collection.mutable.Buffer[T]): Unit = {
      var i = xs.length - 1
      while (i > 0) {
        val j = randbelow(i + 1L).toInt
        val t = xs(i); xs(i) = xs(j); xs(j) = t
        i -= 1
      }
    }
  }

  final case class Assignment(train: Seq[Long], dev: Seq[Long], test: Seq[Long])

  /** The reference's split over the corpus ID vector (corpus order),
    * returning ordered id lists per split. 1:1 port of
    * split_dataset.py:17-144 (fixed-ids branch). */
  def assign(
      corpusIds: Seq[Long],
      devIdsFixed: Seq[Long],
      testIdsFixed: Seq[Long],
      splitSize: Int): Assignment = {
    val rng = new PythonRandom(42L)
    val devIds = scala.collection.mutable.ArrayBuffer(devIdsFixed: _*)
    val devSet = scala.collection.mutable.Set(devIdsFixed: _*)
    val testIds = scala.collection.mutable.ArrayBuffer(testIdsFixed: _*)
    val testSet = scala.collection.mutable.Set(testIdsFixed: _*)
    val foundDev = scala.collection.mutable.LinkedHashSet.empty[Long]
    val foundTest = scala.collection.mutable.LinkedHashSet.empty[Long]
    val trainIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val articles = scala.collection.mutable.ArrayBuffer(corpusIds: _*)
    corpusIds.foreach { id =>
      if (devSet.contains(id)) foundDev += id
      else if (testSet.contains(id)) foundTest += id
      else trainIds += id
    }
    // the reference shuffles the ARTICLE list first, then train_ids — both
    // consume the same seed-42 stream, so the order matters for parity
    rng.shuffle(articles)
    rng.shuffle(trainIds)
    val fillDev = scala.collection.mutable.Set.empty[Long]
    while (foundDev.size + fillDev.size < splitSize && trainIds.nonEmpty) {
      val id = trainIds.remove(trainIds.length - 1) // train_ids.pop()
      devIds += id; devSet += id; fillDev += id
    }
    val fillTest = scala.collection.mutable.Set.empty[Long]
    while (foundTest.size + fillTest.size < splitSize && trainIds.nonEmpty) {
      val id = trainIds.remove(trainIds.length - 1)
      testIds += id; testSet += id; fillTest += id
    }
    // write order: original dev/test ids first (list order, found only)...
    val devOut = scala.collection.mutable.ArrayBuffer.empty[Long]
    val testOut = scala.collection.mutable.ArrayBuffer.empty[Long]
    devIds.foreach { id => if (foundDev.contains(id)) { devOut += id; devSet -= id } }
    testIds.foreach { id => if (foundTest.contains(id)) { testOut += id; testSet -= id } }
    // ...then everything else in shuffled-article order
    val trainSet = trainIds.toSet
    val trainOut = scala.collection.mutable.ArrayBuffer.empty[Long]
    articles.foreach { id =>
      if (devSet.contains(id)) { devOut += id; devSet -= id }
      else if (testSet.contains(id)) { testOut += id; testSet -= id }
      else if (trainSet.contains(id)) trainOut += id
    }
    Assignment(trainOut.toSeq, devOut.toSeq, testOut.toSeq)
  }

  /** Distributed application: tags each row with (split, split_order).
    * The id vector is collected (ids only); rows join back distributed. */
  def split(
      df: DataFrame,
      idCol: String,
      devIdsFixed: Seq[Long],
      testIdsFixed: Seq[Long],
      splitSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ids = df.select(col(idCol).cast("long")).as[Long].collect().toSeq
    val a = assign(ids, devIdsFixed, testIdsFixed, splitSize)
    val tagged =
      a.train.zipWithIndex.map { case (id, i) => (id, "train", i.toLong) } ++
        a.dev.zipWithIndex.map { case (id, i) => (id, "dev", i.toLong) } ++
        a.test.zipWithIndex.map { case (id, i) => (id, "test", i.toLong) }
    val tags = tagged.toDF("__id", "split", "split_order")
    df.join(tags, col(idCol).cast("long") === col("__id"), "inner").drop("__id")
  }
}
