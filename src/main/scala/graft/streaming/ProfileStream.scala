package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.functions.{GraftHash, KmvBuffer}
import graft.operators.Profile

/** Streaming twin of [[graft.operators.Profile]]: a RUNNING per-column
  * profile over a record stream — the ingestion-time data-contract
  * monitor (the batch row is the post-hoc audit; this is the one that
  * pages you while the bad drop is still landing). Emits one updated
  * row per column per micro-batch (OutputMode.Update).
  *
  * State per column is FIXED-SIZE: six scalars (n, n_null, typed
  * min/max pairs) plus a k-long KMV bottom-k sketch for the running
  * distinct estimate — the 100 TB distinct path the batch docstring
  * names (`q_distinct_sketch`); exact row/null counts and min/max fold
  * exactly, and the KMV minima set over DISTINCT hashes is
  * order-independent, so the stream's estimate equals the batch KMV
  * aggregate over the same canonical values bit-for-bit (spec-pinned,
  * heap AND RocksDB state stores). Canonical values hash through the
  * same FNV-1a 64 as every other sketch in the engine.
  *
  * Scale shape: the unpivot is narrow; the groupByKey moves
  * (col_name, value) rows to |columns| state keys — at high volume
  * pre-aggregate per partition first (the batch operator's map-side
  * distinct collapse) or shard col_name like
  * [[VocabularyStream.vocabulary]] does; state stays |columns| × k
  * longs either way. */
object ProfileStream {

  case class PRow(col_name: String, val_num: Option[Long],
                  val_str: Option[String])
  case class ColumnProfile(col_name: String, n: Long, n_null: Long,
                           est_distinct: Long, sketch_size: Int,
                           min_num: Option[Long], max_num: Option[Long],
                           min_str: Option[String], max_str: Option[String])
  case class PState(n: Long, nNull: Long, minima: Array[Long],
                    minNum: Option[Long], maxNum: Option[Long],
                    minStr: Option[String], maxStr: Option[String])

  /** FNV hash of a row's canonical non-null value (numeric renders as
    * its decimal string) — one hash domain across both typed pairs,
    * shared with the batch-side comparison aggregate in the spec. */
  def valueHash(valNum: Option[Long], valStr: Option[String]): Option[Long] =
    valNum.map(v => GraftHash.fnv1a64(v.toString.getBytes("UTF-8")))
      .orElse(valStr.map(s => GraftHash.fnv1a64(s.getBytes("UTF-8"))))

  /** `a < b` in UTF-8 BYTE order — the order Spark's min/max on StringType
    * uses (UTF8String.compareTo is an unsigned byte compare). Scala's
    * String `<` compares UTF-16 code units, which disagrees with UTF-8
    * byte order for strings mixing supplementary (surrogate-pair) and
    * high-BMP characters; folding with this keeps the stream's min_str /
    * max_str bit-equal to the batch profile on ANY input, not just
    * ASCII. */
  def utf8Lt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  /** `records` stream + the SAME canonicalization specs as the batch
    * operator → running per-column profile. */
  def profile(records: DataFrame, numSpecs: Seq[(String, Column)],
              strSpecs: Seq[(String, Column)], k: Int = 256)
      : Dataset[ColumnProfile] = {
    val spark = records.sparkSession
    import spark.implicits._
    Profile.unpivot(records, numSpecs, strSpecs).as[PRow]
      .groupByKey(_.col_name)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (colName: String, rows: Iterator[PRow],
         state: GroupState[PState]) =>
          val buf = new KmvBuffer(k)
          var (n, nNull) = (0L, 0L)
          var minNum: Option[Long] = None
          var maxNum: Option[Long] = None
          var minStr: Option[String] = None
          var maxStr: Option[String] = None
          state.getOption.foreach { s =>
            s.minima.foreach(buf.add)
            n = s.n; nNull = s.nNull
            minNum = s.minNum; maxNum = s.maxNum
            minStr = s.minStr; maxStr = s.maxStr
          }
          rows.foreach { r =>
            n += 1
            valueHash(r.val_num, r.val_str) match {
              case None => nNull += 1
              case Some(h) => buf.add(h)
            }
            r.val_num.foreach { v =>
              minNum = Some(minNum.fold(v)(math.min(_, v)))
              maxNum = Some(maxNum.fold(v)(math.max(_, v)))
            }
            r.val_str.foreach { s =>
              minStr = Some(minStr.fold(s)(m => if (utf8Lt(s, m)) s else m))
              maxStr = Some(maxStr.fold(s)(m => if (utf8Lt(m, s)) s else m))
            }
          }
          val minima = new Array[Long](buf.set.size)
          var i = 0
          buf.set.forEach { x => minima(i) = x.longValue(); i += 1 }
          state.update(PState(n, nNull, minima, minNum, maxNum,
            minStr, maxStr))
          val (est, _) = buf.estimate
          ColumnProfile(colName, n, nNull, est, minima.length,
            minNum, maxNum, minStr, maxStr)
      }
  }
}
