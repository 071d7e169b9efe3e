package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench/ops pre-pass: build every standing stage OUTSIDE any
  * measured window, in dependency order, with independent builds
  * running concurrently (VERDICT r16 #3 — the old pre-pass EXECUTED
  * the whole query grid serially, ~2× the timed total and growing
  * every round).
  *
  * How it stays drift-proof AND dependency-ordered without a
  * hand-kept stage manifest: every standing stage in this library
  * materializes EAGERLY at query-CONSTRUCTION time —
  * [[graft.operators.Warehouse.standingTable]] builds/adopts inside
  * the shared-stage accessor call, and the in-JVM session caches
  * (`localCheckpoint`-backed) are eager too — so CONSTRUCTING a
  * query's DataFrame performs all of its standing work. Walking
  * `SparkEntry.queries` therefore covers every stage by construction
  * (a new stage arrives with its consumer — nothing to forget), and
  * dependency order is enforced by the accessor nesting itself: a
  * dependent stage's builder CALLS its prerequisite's accessor
  * (sweepTruth → sweepBase, editPairs → lshPairs, components → pairs
  * → hashes), so no stated order can be wrong. Concurrency is safe
  * because same-stage racers serialize on the session cache's
  * `computeIfAbsent` (and cross-JVM on the registry lease), while
  * different stages proceed in parallel; the cache-map lock graph
  * follows the acyclic stage DAG, so there is no deadlock order.
  * (Caveat for future stages: a build must never call `getOrBuild`
  * on its OWN cache map with another key — ConcurrentHashMap forbids
  * recursive updates of the same map.)
  */
object StandingWarm {

  /** Construct AND noop-execute each query concurrently: construction
    * builds every standing stage; the single untimed execution warms
    * what the timed passes would otherwise be first to pay (codegen
    * compilation, JIT, broadcast builds, page cache) so min(cold,
    * rerun) stays a steady-state measurement comparable round over
    * round (measured: construction-only warm left the timed basis
    * ~20% hotter than r16's executed-grid pre-pass; executing here
    * restores the basis while the 8-way pool keeps the pre-pass well
    * under the timed total). NonFatal per-query errors are logged and
    * swallowed (the timed pass records them in the errors map); fatal
    * errors (OOM, interrupts) propagate — a corrupted JVM must not
    * proceed to a timed pass. */
  def warm(s: SparkSession, d: String,
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      parallelism: Int = 8,
      execute: Boolean = true): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    try {
      val tasks = queries.map { case (name, fn) =>
        name -> pool.submit(new Runnable {
          override def run(): Unit =
            try {
              val df = fn(s, d) // construction = every standing build
              if (execute)
                df.write.format("noop").mode("overwrite").save()
            } catch {
              case scala.util.control.NonFatal(e) =>
                System.err.println(s"[warm] $name failed during standing " +
                  s"construction (timed pass will record it): ${e.getMessage}")
            }
        })
      }
      tasks.foreach { case (_, t) =>
        try t.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause // fatal by construction: NonFatal was caught
        }
      }
    } finally pool.shutdown()
  }
}
