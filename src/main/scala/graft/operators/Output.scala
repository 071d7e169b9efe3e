package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Presentation-sort helper for queries whose plan is NARROW end to end
  * (scan → project, no shuffle). A global orderBy plans a range
  * exchange, and the range partitioner SAMPLES its child to pick
  * bounds — without a shuffle boundary in between, that re-executes the
  * whole narrow child a second time (scan, regexes, hash chains, decode
  * stubs — measured ~2× wall time on the x/m query family). Hashing the
  * computed (narrow) result through one small shuffle first gives the
  * sampler a materialized input to replay instead.
  *
  * Queries that already shuffle (aggregate, window, join) before their
  * trailing sort don't need this — the sampler replays their last
  * shuffle output for free.
  */
object Output {
  def ordered(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(keys.head).orderBy(keys: _*)
}
