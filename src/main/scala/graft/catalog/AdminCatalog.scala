package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Namespace, Tenant}

/** S6/J1/J2/U1: Admin-API catalog enumeration seams
  * (pulsar_remote_inspector.py:344-421).
  *
  * The HTTP client is INJECTED (`fetch*` functions): catalog listing
  * is a driver-side control-plane concern (tiny data, authenticated
  * REST), while everything downstream — the tenant→namespace fan-out,
  * the 3-way topic union with first-wins dedup, partition rollups —
  * is Spark dataflow on the resulting DataFrames. Tests inject
  * fixture-backed fetchers; production injects an HTTP client.
  * 404 → empty list is the injected function's contract (P7).
  */
object AdminCatalog {

  def tenantsDF(spark: SparkSession, fetchTenants: () => Seq[String]): DataFrame = {
    import spark.implicits._
    fetchTenants().map(Tenant).toDF()
  }

  /** J1: per-tenant namespace expansion (driver fan-out, DataFrame
    * result). */
  def namespacesDF(spark: SparkSession, tenants: Seq[String],
      fetchNamespaces: String => Seq[String]): DataFrame = {
    import spark.implicits._
    tenants.flatMap(t => fetchNamespaces(t).map(ns => Namespace(t, ns))).toDF()
  }

  /** J2+U1: per-namespace topic expansion across the three REST
    * flavors (plain, partitioned, system), merged with the
    * first-occurrence-wins dedup of the reference
    * (pulsar_remote_inspector.py:400-427). */
  def topicsDF(spark: SparkSession, namespaces: Seq[String],
      fetchPlain: String => Seq[String],
      fetchPartitioned: String => Seq[String],
      fetchSystem: String => Seq[String]): DataFrame = {
    import spark.implicits._
    def df(kind: Int, fetch: String => Seq[String]) =
      namespaces.flatMap(ns => fetch(ns).map(t => (ns, t, kind)))
        .toDF("namespace", "topic", "src_rank")
    val all = df(1, fetchPlain)
      .unionAll(df(2, fetchPartitioned))
      .unionAll(df(3, fetchSystem))
    all.groupBy(col("namespace"), col("topic"))
      .agg(min(col("src_rank")).as("src_rank"))
      .withColumn("partitioned",
        col("topic").rlike(CatalogOps.partitionSuffix))
      .withColumn("is_system", col("src_rank") === 3)
  }
}
