package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed-table helpers: the storage-level half of shuffle avoidance.
  *
  * A table written `bucketBy(n, key).sortBy(key)` carries its hash
  * partitioning INTO every later scan: a join (or aggregation) keyed on
  * the bucket column reads each bucket pre-hashed, so the sort-merge
  * join needs NO exchange on either side — at 100 TB that converts the
  * dominant repeated cost of a fact⋈fact join pipeline (re-shuffling
  * both sides on every run) into a one-time cost paid at ingest. Spark
  * propagates the co-partitioning through an inner join
  * (`PartitioningCollection`), so a following groupBy on either side's
  * key aggregates exchange-free too (asserted in PlanSuite). Spark 3+
  * no longer claims the in-bucket SORT order at scan time (the legacy
  * bucketedTableScanOutputOrdering conf defaults off), so SortExec
  * nodes remain — but with `sortBy` + one file per bucket they run over
  * already-sorted runs, a near-free in-memory pass with no exchange.
  *
  * This is plumbing over public Spark APIs (`DataFrameWriter.bucketBy` /
  * `saveAsTable`); the helper exists to pin the contract — external
  * table at an explicit path, overwrite-safe, same bucket count on both
  * sides — and to be the documented co-location pattern the brief's
  * scale checklist calls for.
  */
object Bucketing {

  /** Write `df` as a bucketed + in-bucket-sorted EXTERNAL parquet table
    * at `path`, replacing any previous table of that name, and return
    * the catalog-backed frame (whose scans carry the bucket
    * partitioning). `buckets` must match on both sides of a co-located
    * join.
    *
    * File lifecycle: the table is EXTERNAL, so `DROP TABLE` removes only
    * catalog metadata — the parquet files at `path` belong to the
    * caller. Re-publishing to the SAME path overwrites in place; writing
    * each run to a fresh temp path orphans the previous copy.
    */
  def bucketize(df: DataFrame, table: String, path: String, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // pre-partition on the bucket key with numPartitions = buckets: the
    // repartition hash IS the bucket hash (pmod(murmur3, n)), so every
    // write task holds exactly one bucket's rows and each bucket gets ONE
    // file — which (a) preserves the sortBy order claim at scan time (a
    // multi-file bucket forfeits outputOrdering and re-inserts a Sort
    // before SMJ) and (b) avoids the tasks×buckets small-file explosion
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }

  /** Equi-join two frames through same-bucket-count bucketed tables —
    * the exchange-free big⋈big join shape. Writes both sides (the
    * one-time ingest cost), then joins on `leftKey === rightKey`.
    */
  def coLocatedJoin(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      buckets: Int, stagingDir: String, namePrefix: String): DataFrame = {
    val lb = bucketize(left, s"${namePrefix}_l", s"$stagingDir/l",
      leftKey, buckets)
    val rb = bucketize(right, s"${namePrefix}_r", s"$stagingDir/r",
      rightKey, buckets)
    // frame-qualified: unqualified col(k) === col(k) is ambiguous when
    // both sides share the key column name
    lb.join(rb, lb(leftKey) === rb(rightKey))
  }
}
