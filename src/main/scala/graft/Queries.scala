package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheRegistry.TrackedPersist

import graft.operators.{Compaction, PrefixSum}
import graft.sources.Tables

/** SURVEY §2.4 extension operators (E1–E24), each as a named query over
  * the driver test tables plus matching DuckDB oracle SQL.
  *
  * Determinism contract (SURVEY §5.2.1): every query ends in a
  * total-order `orderBy`; float-valued aggregates are rounded so that
  * Spark/DuckDB summation-order differences cannot leak into the hash
  * compare; column names are aliased identically on both sides.
  *
  * Scale notes are inline per query — broadcast hints on dimension
  * joins, partial aggregation shapes, TakeOrderedAndProject for top-k.
  */
object Queries
    extends QueriesShared
    with QueriesCore
    with QueriesIo
    with QueriesSql
    with QueriesMedia
    with QueriesGraph
    with QueriesDedup
    with QueriesMl
    with QueriesText
    with QueriesTime
    with QueriesStats
    with QueriesStreaming {

  /** Aggregated driver map — identical key set and closures to the
    * pre-split monolith (the split is per-family traits mixed into
    * this object; dev/split_queries.py verified entry parity). */
  val all: Map[String, (SparkSession, String) => DataFrame] =
    coreAll ++ ioAll ++ sqlAll ++ mediaAll ++ graphAll ++ dedupAll ++ mlAll ++ textAll ++ timeAll ++ statsAll ++ streamingAll

  val oracle: Map[String, String] =
    coreOracle ++ ioOracle ++ sqlOracle ++ mediaOracle ++ graphOracle ++ dedupOracle ++ mlOracle ++ textOracle ++ timeOracle ++ statsOracle ++ streamingOracle
}
