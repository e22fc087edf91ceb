package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-governance operators beside [[CheckSuite.kAnonymity]]: the
  * erasure-request impact plan (GDPR right-to-be-forgotten cascade) and
  * the referential-integrity orphan audit. Both are count reports built
  * from semi/anti joins — the key sets flow down the foreign-key chain,
  * the fact tables are never shuffled beyond one key join each, and the
  * outputs are O(tables), so they run as cheap pre-flight gates before
  * the actual delete/repair jobs.
  */
object Governance {

  /** Erasure cascade impact: starting from a root key set (the erasure
    * requests), follow the foreign-key chain and count the rows each
    * table would lose. `levels` = (tableName, df, fkCol matching the
    * PREVIOUS level's keys, pkCol exported to the NEXT level), in chain
    * order. Returns (table_name, n_rows) — the plan a deletion job (or
    * [[graft.ops.CoreOps.mergeInto]] with delete rows) executes.
    */
  def cascadeImpact(rootName: String, rootKeys: DataFrame,
                    levels: Seq[(String, DataFrame, String, String)]): DataFrame = {
    require(rootKeys.columns.length == 1, "rootKeys must be a single key column")
    var keys = rootKeys.toDF("__k").distinct()
    val counts = Seq.newBuilder[DataFrame]
    counts += keys.agg(count(lit(1)).as("n_rows"))
      .select(lit(rootName).as("table_name"), col("n_rows"))
    levels.foreach { case (name, df, fkCol, pkCol) =>
      val affected = df.join(keys, df(fkCol) === col("__k"), "left_semi")
      counts += affected.agg(count(lit(1)).as("n_rows"))
        .select(lit(name).as("table_name"), col("n_rows"))
      keys = affected.select(col(pkCol).as("__k")).distinct()
    }
    counts.result().reduce(_ unionByName _)
  }

  /** Referential-integrity audit: for each declared (child —fk→ parent)
    * relation, count child rows whose non-null foreign key has no parent
    * (orphans — a broken star schema the inner joins of the transform
    * layer would silently DROP, which is why the audit runs first).
    * Returns (relation, n_orphans); 0 everywhere is the healthy state.
    */
  def orphanCounts(relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    relations.map { case (name, child, fk, parent, pk) =>
      child.select(col(fk)).filter(col(fk).isNotNull)
        .join(parent.select(col(pk).as("__pk")), col(fk) === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("relation"), col("n_orphans"))
    }.reduce(_ unionByName _)
}
