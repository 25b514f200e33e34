package graft

import org.apache.spark.sql.functions._
import graft.operators.Bloom
import graft.sources.Tables

class BloomSpec extends SparkSuite {
  import spark.implicits._

  lazy val t = Tables(spark, sfDir)
  private def big = t.lineitem.select($"l_orderkey", $"l_quantity")
  private def small = t.orders.filter($"o_orderpriority" === "1-URGENT")
    .select($"o_orderkey")

  test("bloom-pruned join returns exactly the plain join's rows") {
    val pruned = Bloom.prunedJoin(big, small, "l_orderkey", "o_orderkey")
      .select($"l_orderkey", $"l_quantity").orderBy($"l_orderkey", $"l_quantity")
      .collect().toSeq
    val plain = big.join(small, $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_quantity").orderBy($"l_orderkey", $"l_quantity")
      .collect().toSeq
    assert(pruned == plain)
  }

  test("pruning drops rows before the join but never true matches") {
    val predicate = Bloom.pruneAgainst(small, "o_orderkey", $"l_orderkey")
    val kept = big.filter(predicate).count()
    val exact = big.join(small.distinct(), $"l_orderkey" === $"o_orderkey",
      "left_semi").count()
    // no false negatives: everything that joins survives the filter
    assert(kept >= exact, s"bloom dropped true matches: $kept < $exact")
    // and the filter actually prunes (1-URGENT is ~20% of orders; even
    // with fpp the survivor set must be well under the full table)
    val all = big.count()
    assert(kept < all * 0.5, s"no pruning happened: $kept of $all survived")
  }

  test("bloom probe runs inside whole-stage codegen before the exchange") {
    val df = Bloom.prunedJoin(big, small, "l_orderkey", "o_orderkey")
    val plan = planOf(df)
    assert(plan.contains("bloom_might_contain"), plan)
    // the filter sits in the scan stage: its first occurrence is BELOW
    // (later in the formatted dump than) the big-side scan and ABOVE any
    // exchange of the big side — cheap structural check: the predicate
    // appears in a Filter node, not after a shuffle read
    val filterLine = plan.linesIterator.find(_.contains("Filter"))
    assert(filterLine.isDefined, plan)
  }

  test("bloom_might_contain is callable from SQL with a binary literal") {
    import org.apache.spark.util.sketch.BloomFilter
    GraftSql.register(spark)
    val bf = BloomFilter.create(100, 0.01)
    (1L to 10L).foreach(bf.putLong)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    val hex = out.toByteArray.map(b => f"$b%02X").mkString
    val got = spark.sql(
      s"SELECT bloom_might_contain(CAST(5 AS BIGINT), X'$hex') AS hit, " +
        s"bloom_might_contain(CAST(987654321 AS BIGINT), X'$hex') AS miss")
      .head()
    assert(got.getBoolean(0))
    assert(!got.getBoolean(1))
  }

  test("expression semantics: membership, nulls, type check") {
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(1000, 0.01)
    (1L to 100L).foreach(bf.putLong)
    val df = Seq(Some(1L), Some(50L), Some(100000000L), None).toDF("k")
      .select($"k", graft.functions.bloom_might_contain($"k", bf).as("m"))
    val got = df.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getLong(0)) ->
        (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(got(1L) == true && got(50L) == true)
    assert(got(null) == null, "null key must stay null")
    // a key never inserted is *almost certainly* absent at fpp=1%
    // (deterministic: the sketch hash of 100000000 does not collide here)
    assert(got(100000000L) == false)
    // non-long keys are rejected at analysis, not silently hashed
    val err = intercept[Exception] {
      Seq("a").toDF("s")
        .select(graft.functions.bloom_might_contain($"s", bf)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("bigint"), err.getMessage)
  }
}
