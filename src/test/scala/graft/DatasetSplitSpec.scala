package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DatasetSplit

/** U5 dataset split vs goldens from executed CPython
  * (tools/gen_split_fixtures.py → golden/dataset_split.json): the MT19937
  * port is pinned against random.seed(42) vectors, and the full split —
  * fixed ids, missing-id fill-up from the shuffled train pool, write
  * order — matches the reference's split_dataset.py semantics. */
class DatasetSplitSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private val golden: ujsonLite.Value = {
    val p = getClass.getResourceAsStream("/golden/dataset_split.json")
    ujsonLite.parse(new String(p.readAllBytes(), StandardCharsets.UTF_8))
  }

  test("MT19937 port matches CPython random.seed(42) getrandbits(32) stream") {
    val rng = new DatasetSplit.PythonRandom(42L)
    val want = golden("vectors")("getrandbits32").arr.map(_.num.toLong)
    val got = Seq.fill(want.length)(rng.getrandbits(32))
    assert(got == want.toSeq)
  }

  test("shuffle port matches CPython random.shuffle") {
    val rng = new DatasetSplit.PythonRandom(42L)
    val xs = scala.collection.mutable.ArrayBuffer((0 until 10).map(_.toLong): _*)
    rng.shuffle(xs)
    assert(xs.toSeq == golden("vectors")("shuffle10").arr.map(_.num.toLong).toSeq)
    // two consecutive shuffles consume one stream (the split does exactly this)
    val rng2 = new DatasetSplit.PythonRandom(42L)
    val a = scala.collection.mutable.ArrayBuffer((0 until 25).map(_.toLong): _*)
    val b = scala.collection.mutable.ArrayBuffer((0 until 7).map(_.toLong): _*)
    rng2.shuffle(a); rng2.shuffle(b)
    assert(a.toSeq == golden("vectors")("shuffle25_then7")("first").arr.map(_.num.toLong).toSeq)
    assert(b.toSeq == golden("vectors")("shuffle25_then7")("second").arr.map(_.num.toLong).toSeq)
  }

  test("split assignment matches the executed reference incl. seed-42 fill-up and write order") {
    val n = golden("n_articles").num.toInt
    val a = DatasetSplit.assign(
      (0 until n).map(_.toLong),
      golden("dev_ids").arr.map(_.num.toLong),
      golden("test_ids").arr.map(_.num.toLong),
      golden("split_size").num.toInt)
    assert(a.dev == golden("dev").arr.map(_.num.toLong).toSeq)
    assert(a.test == golden("test").arr.map(_.num.toLong).toSeq)
    assert(a.train == golden("train").arr.map(_.num.toLong).toSeq)
  }

  test("distributed split tags rows with split + order") {
    import spark.implicits._
    val n = golden("n_articles").num.toInt
    val df = (0 until n).map(i => (i.toLong, s"article-$i")).toDF("id", "body")
    val got = DatasetSplit.split(df, "id",
      golden("dev_ids").arr.map(_.num.toLong),
      golden("test_ids").arr.map(_.num.toLong),
      golden("split_size").num.toInt)
    val dev = got.where($"split" === "dev").orderBy($"split_order")
      .select($"id").as[Long].collect().toSeq
    assert(dev == golden("dev").arr.map(_.num.toLong).toSeq)
    assert(got.count() == n)
  }
}
