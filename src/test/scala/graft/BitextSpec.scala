package graft

import org.apache.spark.sql.functions._
import graft.operators.Search

class BitextSpec extends SparkSuite {
  import spark.implicits._

  private def vecs(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  private def queries(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("query_id", "qv")

  test("marginMine: isolated mutual pairs accepted, hub region rejected") {
    // x1's true pair is y10 (cos 1.0, nothing else near); x2's rank-1 is
    // y20 — but y20 sits in a HUB: its twin y21 is equally similar to
    // x2, and y20 is equally similar to BOTH queries, so every
    // neighborhood average ≈ the pair cosine and the ratio margin
    // collapses to ~1.0. Raw cosine ranks x2-y20 (0.949) ABOVE many
    // honest pairs — the margin is what tells them apart.
    val a = (3.0 / math.sqrt(10)).toFloat // 0.94868
    val b = (1.0 / math.sqrt(10)).toFloat
    val q = queries(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0.8f, 0.6f, 0f, 0f))
    val c = vecs(
      10L -> Array(1f, 0f, 0f, 0f),    // x1's isolated true pair
      20L -> Array(a, b, 0f, 0f),      // hub: cos ≈ .949 to BOTH queries
      21L -> Array(a, b, 0f, 0f),      // hub twin
      30L -> Array(0f, 0f, 1f, 0f))    // far from everything
    val got = Search.marginMine(q, c, k = 2, threshold = 1.05)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got.size == 2)
    val (y1, cos1, margin1, acc1) = got(1L)
    assert(y1 == 10L && cos1 >= 0.999999 && acc1,
      s"isolated pair must mine: $cos1 $margin1")
    // fwd_pen(x1) = cos(x1,y10) + cos(x1,y20) ≈ 1.9487e6;
    // bwd_pen(y10) = 1 + cos(x2,y10)=0.8 → 1.8e6; margin ≈
    // 1e6·4e4/3.75e6 ≈ 1.067 — above threshold, but barely: the dense
    // second neighbors already drag it toward 1
    assert(margin1 > 1.05 && margin1 < 1.2, s"margin1 $margin1")
    val (y2, cos2, margin2, acc2) = got(2L)
    // rank-1 ties on score break by id: the twin hubs tie exactly
    assert(y2 == 20L && cos2 > 0.94 && cos2 < 0.95)
    // x2's neighborhood (y20, y21 twins) and y20's neighborhood (x2,
    // x1 at the same cosine) average to the pair cosine itself →
    // margin ≈ 1.0 → rejected despite the highest raw cosine mined
    assert(!acc2 && margin2 < 1.05, s"hub must reject: $margin2")
  }

  test("marginMine: grid arithmetic is exact and self-matches never crash") {
    // orthonormal corpus: each query's lone neighbor is its own copy;
    // second neighbors are 0, so fwd_pen = m_xy, bwd_pen = m_xy and
    // margin = m·2·k·1e4 DIV (2m) = k·1e4 → exactly k.0 for k=2
    val q = queries(1L -> Array(1f, 0f, 0f, 0f), 2L -> Array(0f, 1f, 0f, 0f))
    val c = vecs(10L -> Array(1f, 0f, 0f, 0f), 20L -> Array(0f, 1f, 0f, 0f))
    val got = Search.marginMine(q, c, k = 2, threshold = 1.05)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 2.0 && got(2L) == 2.0, s"exact grid: $got")
  }
}
