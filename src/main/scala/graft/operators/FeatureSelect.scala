package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{preprocess, tokens}
import graft.operators.Barrier.BarrierOps

/** Supervised feature selection over the corpus vocabulary: rank tokens
  * by the mutual information between their PRESENCE in a document and
  * the document's class (here `lang`) — the statistic behind building a
  * compact feature set for a FastText-style quality/domain classifier
  * before training it (the [[Classifier]] counterpart on the text side).
  *
  * MI(t; L) = Σ_l [ p(t,l)·ln(p(t,l)/(p(t)p(l)))
  *                + p(t̄,l)·ln(p(t̄,l)/(p(t̄)p(l))) ]
  * over binary presence — both the present and ABSENT cells, so a token
  * that never occurs in one language is credited for that too (pure PMI
  * rankings miss it).
  *
  * Scale shape: one tokenize+explode pass collapsed to (token, lang)
  * document counts — the only corpus-sized shuffle, map-side combined;
  * the language marginals are a |L|-row broadcast, so the per-token fold
  * is a narrow pass over the (token × |L|) grid of the df-filtered
  * vocabulary. No corpus-wide sort; the final top-k is a bounded
  * TakeOrdered.
  *
  * Determinism: every probability is a ratio of exact BIGINT counts, so
  * each cell's double is bit-identical in both engines; cells are
  * floored to 1e-9 integer nano-units and SUMMED AS LONGS (the
  * text_entropy order-free-sum discipline), so the cross-lang sum cannot
  * depend on partition order; ranking uses the exact nano sum. */
object FeatureSelect {

  /** The shared (kept token × lang) presence-cell grid behind
    * [[tokenLangMi]] and [[tokenLangChi2]]: `(tok, lang, df, n_l,
    * n_docs, n_tl)` with a row for EVERY kept-token × lang pair (the
    * absent cell of a pair the token never occurs in must exist before
    * either fold). One tokenize+explode corpus pass, map-side combined;
    * marginals broadcast. */
  private def presenceCells(docs: DataFrame, minDf: Long): DataFrame = {
    // distinct-per-document tokens: presence, not frequency. barrier():
    // explode (Generate) re-evaluates its child per output row.
    val tl = docs
      .select(col("lang"),
        array_distinct(tokens(preprocess(col("text")))).as("toks"))
      .barrier()
      .select(col("lang"), explode(col("toks")).as("tok"))
      .groupBy(col("tok"), col("lang")).agg(count(lit(1)).as("n_tl"))
    val dfT = tl.groupBy(col("tok")).agg(sum(col("n_tl")).as("df"))
      .filter(col("df") >= minDf)
    val langTot = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    dfT
      .crossJoin(broadcast(langTot))
      .crossJoin(broadcast(nDocs))
      .join(tl, Seq("tok", "lang"), "left")
      .na.fill(0L, Seq("n_tl"))
  }

  def tokenLangMi(docs: DataFrame, minDf: Long = 20,
                  topK: Int = 50): DataFrame = {
    val cells = presenceCells(docs, minDf)

    val a = col("n_tl").cast("double")
    val b = (col("n_l") - col("n_tl")).cast("double")
    val nl = col("n_l").cast("double")
    val nd = col("n_docs").cast("double")
    val dft = col("df").cast("double")
    val present = when(col("n_tl") > 0,
      (a / nd) * log((a * nd) / (dft * nl))).otherwise(lit(0.0))
    val absent = when(col("n_l") - col("n_tl") > 0,
      (b / nd) * log((b * nd) / ((nd - dft) * nl))).otherwise(lit(0.0))

    cells
      .withColumn("cell", floor((present + absent) * 1e9).cast("long"))
      .groupBy(col("tok"), col("df"))
      .agg(sum(col("cell")).as("mi_nano"))
      .orderBy(col("mi_nano").desc, col("tok"))
      .limit(topK)
      .select(col("tok"), col("df"),
        (col("mi_nano").cast("double") / 1e9).as("mi"))
  }

  /** Pearson chi-squared token↔lang association over the SAME presence
    * cells as [[tokenLangMi]] — the classic feature-selection twin
    * (χ² weights rare-but-exclusive tokens harder than MI, which is why
    * pipelines rank by both before picking a vocabulary):
    *
    * χ²(t) = Σ_l [ (n_tl − E_pl)²/E_pl + ((n_l−n_tl) − E_al)²/E_al ],
    * E_pl = df·n_l/N, E_al = (N−df)·n_l/N.
    *
    * Same scale shape (one corpus tokenize pass, bounded grid fold) and
    * the same cross-engine discipline: every expected value is a double
    * of exact BIGINT products, each lang's (present + absent) term is
    * floored to 1e-9 nano-units and SUMMED AS LONGS — order-free —
    * with ranking on the exact nano sum. */
  def tokenLangChi2(docs: DataFrame, minDf: Long = 20,
                    topK: Int = 50): DataFrame = {
    val cells = presenceCells(docs, minDf)

    val nTl = col("n_tl").cast("double")
    val nAl = (col("n_l") - col("n_tl")).cast("double")
    val nl = col("n_l").cast("double")
    val nd = col("n_docs").cast("double")
    val dft = col("df").cast("double")
    val ePl = dft * nl / nd
    val eAl = (nd - dft) * nl / nd
    val present = (nTl - ePl) * (nTl - ePl) / ePl
    // a token present in EVERY document has E_al = 0 and O_al = 0: the
    // absent cell contributes nothing (and the division would NaN)
    val absent = when(col("n_docs") > col("df"),
      (nAl - eAl) * (nAl - eAl) / eAl).otherwise(lit(0.0))

    cells
      .withColumn("cell", floor((present + absent) * 1e9).cast("long"))
      .groupBy(col("tok"), col("df"))
      .agg(sum(col("cell")).as("chi2_nano"))
      .orderBy(col("chi2_nano").desc, col("tok"))
      .limit(topK)
      .select(col("tok"), col("df"),
        (col("chi2_nano").cast("double") / 1e9).as("chi2"))
  }
}
