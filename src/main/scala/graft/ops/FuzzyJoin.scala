package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance (fuzzy) join — entity resolution over name
  * catalogs, spelling-variant detection, record linkage.
  *
  * An unblocked fuzzy join is a cartesian product with a per-pair
  * `levenshtein` — the canonical scale-killer. This operator takes
  * the two standard bounds instead:
  *
  *  1. '''Blocking''': pairs are only generated inside equal
  *     `blockCol` groups (a hash equi-join), so candidate count is
  *     Σ|block|² not n². The caller picks a block key that edit-close
  *     strings must share (here: a stable token of the name; in
  *     production also phonetic keys or length buckets).
  *  2. '''Length prefilter''': `|len(a) − len(b)| ≤ maxDist` is a
  *     necessary condition for `levenshtein(a,b) ≤ maxDist` and costs
  *     two integers — it short-circuits the O(len²) DP for most
  *     candidates inside the same codegen conjunction.
  *
  * At 100 TB the decisive move happens BEFORE this operator: fuzzy
  * joins run over the '''distinct-key dictionary''' (names dedup to
  * a frame orders of magnitude smaller than the fact table — the
  * gate's `part` catalog holds 2 000 rows but 64 names), never over
  * raw fact rows; fact rows re-attach by exact key afterwards.
  */
object FuzzyJoin {

  /** All pairs (left row, right row) with equal `blockCol` and
    * `levenshtein(leftText, rightText) ≤ maxDist`, plus a `dist`
    * column. Callers dedupe/direct pairs via their own key predicate
    * (e.g. `k1 < k2` for a self-join).
    */
  def byEditDistance(left: DataFrame, right: DataFrame, blockCol: String,
      leftText: String, rightText: String, maxDist: Int,
      pairFilter: Column): DataFrame =
    // the cheap O(1) prefilters run BEFORE the DP; the O(len²)
    // levenshtein is computed ONCE and the threshold filters on the
    // result column. A plain withColumn alias is NOT enough: Catalyst
    // inlines the alias and pushes the predicate into the join
    // condition, and the project then re-runs the DP for every
    // surviving candidate (verified on the optimized plan). Routing
    // `dist` through a one-element explode pins it — predicates on
    // generator output cannot cross the Generate, and GenerateExec
    // stays inside the same codegen stage (no shuffle, no
    // materialization; rows still stream join → dist → filter).
    left.join(right, blockCol)
      .filter(pairFilter &&
        abs(length(col(leftText)) - length(col(rightText))) <= maxDist)
      .select(col("*"),
        explode(array(levenshtein(col(leftText), col(rightText)))).as("dist"))
      .filter(col("dist") <= maxDist)

  /** Entity-resolution canonicalization: the full record-linkage
    * composition — fuzzy pairs → connected components → one canonical
    * record per entity cluster. Input is a DICTIONARY frame (one row
    * per distinct `nameCol`, with a stable numeric `idCol` such as
    * min source key — see [[byEditDistance]]'s scale note: ER always
    * runs over the distinct dictionary, never raw fact rows). Output
    * maps every name to its `entity_id` (the min reachable id over
    * the edit-distance graph) and the `canonical_name` that id
    * carries — spelling variants collapse to one entity, unmatched
    * names are their own.
    *
    * Components run over the numeric ids
    * ([[graft.ext.Dedup.connectedComponents]] — the adaptive
    * union-find / pointer-jumping path), and the canonical-name
    * attachment is one self-join of the (tiny) labeled dictionary on
    * `entity_id`.
    */
  def canonicalEntities(dict: DataFrame, idCol: String, nameCol: String,
      blockCol: String, maxDist: Int): DataFrame = {
    val a = dict.select(col(blockCol), col(nameCol).as("__n1"),
      col(idCol).as("__i1"))
    val b = dict.select(col(blockCol), col(nameCol).as("__n2"),
      col(idCol).as("__i2"))
    val pairs = byEditDistance(a, b, blockCol, "__n1", "__n2", maxDist,
        pairFilter = col("__n1") < col("__n2"))
      .select(col("__i1").as("doc_a"), col("__i2").as("doc_b"))
    val comp = graft.ext.Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .withColumnRenamed("node", idCol)
    val labeled = dict.join(comp, Seq(idCol), "left")
      .withColumn("entity_id", coalesce(col("component"), col(idCol)))
      .select(col(idCol), col(nameCol), col("entity_id"))
    labeled.join(
        labeled.filter(col(idCol) === col("entity_id"))
          .select(col("entity_id"), col(nameCol).as("canonical_name")),
        Seq("entity_id"))
      .select(col(nameCol), col("entity_id"), col("canonical_name"))
  }
}
