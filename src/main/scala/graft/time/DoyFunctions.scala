package graft.time

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Leap-normalized day-of-year calendar, the reference's internal
  * "2012 calendar" (reference: src/mhw3d/common/core.py:5-17 `_clim_doy`).
  *
  * Feb 29 is always DOY 60 and Mar 1 always DOY 61 in every year: in
  * non-leap years every natural DOY >= 60 shifts +1. All are pure Column
  * expressions — codegen'd, no UDFs.
  */
object DoyFunctions {

  /** Gregorian leap-year predicate. */
  def isLeap(year: Column): Column =
    (year % 4 === 0) && ((year % 100 =!= 0) || (year % 400 === 0))

  /** Leap-normalized DOY of a date/timestamp column. */
  def climDoy(date: Column): Column = {
    val d = dayofyear(date)
    when(!isLeap(year(date)) && d >= 60, d + 1).otherwise(d)
  }

  /** Circular re-centering of a raw (possibly out-of-[1,366]) DOY onto
    * the 366-slot grid: ((raw - 1 + 366) % 366) + 1. Valid for raw >= -365. */
  def wrapDoy(raw: Column): Column = ((raw - 1 + 366) % 366) + 1

  /** Oracle-SQL fragment for [[climDoy]] over a date expression (ANSI,
    * DuckDB-compatible). */
  def climDoySql(d: String): String =
    s"""CASE WHEN (year($d) % 4 = 0 AND (year($d) % 100 <> 0 OR year($d) % 400 = 0))
       |THEN dayofyear($d)
       |ELSE CASE WHEN dayofyear($d) >= 60 THEN dayofyear($d) + 1 ELSE dayofyear($d) END END""".stripMargin.replace("\n", " ")
}
