package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic aggregate arithmetic.
  *
  * Floating-point SUM/AVG depend on accumulation order (Spark's
  * partial/final aggregation vs a single-threaded oracle), and double
  * PRODUCTS of values that are exact decimals land within an ulp of a
  * rounding boundary — so the engine's rule for every verified
  * aggregate is: move into exact DECIMAL space *before* any arithmetic,
  * aggregate exactly (decimal addition is associative, so map-side
  * combine stays enabled), and cast the final result to DOUBLE.
  *
  * This mirrors how the reference's warehouse would behave (BigQuery
  * NUMERIC) rather than its pandas float64 intermediates
  * (`/root/reference/weekly_dag.py:93-104`), per SURVEY §7.5.1-2.
  *
  * The `sql*` helpers emit the DuckDB-oracle spelling of the same
  * operation; keep the two sides textually in sync.
  */
object Exact {

  /** Monetary column: data is 2-decimal (FIXTURES.md tables). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Small rate column (discount/tax): 2-decimal in [0,1). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Decimal literal 1.00 for (1 ± rate) factors. */
  def one: Column = lit(1).cast(DecimalType(4, 2))

  /** Exact sum of a decimal expression → DOUBLE. */
  def dsumExact(e: Column): Column = sum(e).cast("double")

  /** Order-insensitive exact sum of a plain double column → DOUBLE. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact mean: decimal sum / count, divided in double space (double
    * division is deterministic; decimal division scale rules are not
    * portable across engines). */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double") / count(c).cast("double")

  // ---- DuckDB-oracle SQL spellings of the same operations ----

  def sqlMoney(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def sqlRate(e: String): String = s"CAST($e AS DECIMAL(4,2))"
  val sqlOne: String = "CAST(1 AS DECIMAL(4,2))"
  def sqlSumExact(e: String): String = s"CAST(SUM($e) AS DOUBLE)"
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT($expr) AS DOUBLE)"

  /** Net revenue `price * (1 - discount)` in exact decimal, both sides. */
  def revenue(price: Column, discount: Column): Column =
    money(price) * (one - rate(discount))
  def sqlRevenue(price: String, discount: String): String =
    s"${sqlMoney(price)} * ($sqlOne - ${sqlRate(discount)})"

  /** Charge `price * (1 - discount) * (1 + tax)` in exact decimal. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    money(price) * (one - rate(discount)) * (one + rate(tax))
  def sqlCharge(price: String, discount: String, tax: String): String =
    s"${sqlMoney(price)} * ($sqlOne - ${sqlRate(discount)}) * ($sqlOne + ${sqlRate(tax)})"
}
