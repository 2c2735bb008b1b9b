package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed views of the core tables (SURVEY §1.4: `Dataset[T]` case
  * classes where type safety pays — the fact and stream rows; dynamic
  * `DataFrame` everywhere schema flexibility matters more).
  * Timestamps surface as `java.sql.Timestamp` via the product encoder.
  */
object Domain {

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: java.sql.Timestamp)

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp,
      o_orderpriority: String)

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String,
      n_chars: Long)

  def lineitems(spark: SparkSession, sfDir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir).as[Lineitem]
  }

  def orders(spark: SparkSession, sfDir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, sfDir).as[Order]
  }

  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, sfDir).as[Event]
  }

  def documents(spark: SparkSession, sfDir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).as[Document]
  }
}
