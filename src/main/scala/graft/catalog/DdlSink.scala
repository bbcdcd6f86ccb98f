package graft.catalog

import org.apache.spark.sql.DataFrame

/** K6: control-plane DDL application (restore / delete)
  * (pulsar_backup_restore.py:159-179,274-291).
  *
  * DDL against an admin API is driver-side by nature: the catalog is
  * tiny (it fit in text files), every call is remote and ordered, and
  * nothing here benefits from executors. What matters for correctness
  * is the ORDER contract the reference encodes: creation is
  * tenants → namespaces → topics (parents first), deletion is the
  * reverse (children first). The admin client is injected.
  */
object DdlSink {

  private def names(df: DataFrame, colName: String): Seq[String] =
    df.select(colName).collect().map(_.getString(0)).toSeq

  /** Restore: create parents before children. Returns the applied
    * DDL in order (useful for dry-run display, K5). */
  def restore(tenants: DataFrame, namespaces: DataFrame, topics: DataFrame,
      createTenant: String => Unit,
      createNamespace: String => Unit,
      createTopic: String => Unit): Seq[(String, String)] = {
    val t = names(tenants, "tenant").sorted
    val ns = names(namespaces, "namespace").sorted
    val tp = names(topics, "topic").sorted
    t.foreach(createTenant)
    ns.foreach(createNamespace)
    tp.foreach(createTopic)
    t.map("tenant" -> _) ++ ns.map("namespace" -> _) ++ tp.map("topic" -> _)
  }

  /** Delete: children before parents, system resources excluded
    * (P3/P4 via CatalogOps.excludeSystem at the call site). */
  def deleteAll(tenants: DataFrame, namespaces: DataFrame, topics: DataFrame,
      deleteTopic: String => Unit,
      deleteNamespace: String => Unit,
      deleteTenant: String => Unit): Seq[(String, String)] = {
    val tp = names(topics, "topic").sorted
    val ns = names(namespaces, "namespace").sorted
    val t = names(tenants, "tenant").sorted
    tp.foreach(deleteTopic)
    ns.foreach(deleteNamespace)
    t.foreach(deleteTenant)
    tp.map("topic" -> _) ++ ns.map("namespace" -> _) ++ t.map("tenant" -> _)
  }
}
