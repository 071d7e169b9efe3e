package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Operational CLI — the counterpart of the reference's only user-facing
  * executable (reference cmd/sqlite-cdc/main.go:32-141): modes
  * setup / teardown / bootstrap / cdc / bootstrap-and-cdc, sink selection
  * (stdout text, stdout JSON, HTTP POST), batch size, blob support,
  * subsecond toggle, log-table override, SIGINT-clean shutdown.
  *
  * Two log topologies (the library supports both; the reference only has
  * the first):
  *  - `--db <jdbc-url>`: the change log lives in the source database
  *    ([[JdbcChangeLog]]); bootstrap snapshots read over JDBC.
  *  - `--log-dir <path>`: the change log is a parquet directory
  *    ([[ParquetChangeLog]]); bootstrap snapshots read parquet from
  *    `--snapshot-dir/<table>.parquet`. This is the 100 TB topology —
  *    capture lands in object storage and consumers parallelize
  *    downstream.
  */
object Main {

  final case class Config(
      db: Option[String] = None,
      dbParams: Option[String] = None,
      logDir: Option[String] = None,
      snapshotDir: Option[String] = None,
      tables: Seq[String] = Nil,
      logTable: String = CdcDdl.DefaultLogTable,
      setup: Boolean = false,
      teardown: Boolean = false,
      bootstrap: Boolean = false,
      cdc: Boolean = false,
      output: String = "-",
      batchSize: Int = 256, // reference CLI default (main.go:65)
      disableSubsec: Boolean = false,
      blobs: Boolean = false,
      pollMs: Long = 100,
      availableNow: Boolean = false,
      ignoreDrift: Boolean = false,
      watchFile: Option[String] = None,
      deadLetter: Option[String] = None)

  val usage: String =
    """usage: graft.cdc.Main [flags]
      |  --db <jdbc-url>        source database (change log + snapshots over JDBC)
      |  --db-params <params>   appended to the JDBC url (reference -db-params)
      |  --log-dir <path>       parquet change-log directory (Spark-native topology)
      |  --snapshot-dir <dir>   parquet snapshot source for --bootstrap with --log-dir
      |  --table <name>         table to monitor/bootstrap; repeatable
      |  --log-table <name>     change-log table name (default __cdc_log)
      |  --setup                install capture (log table + triggers) before any mode
      |  --teardown             remove capture, then exit (overrides other modes)
      |  --bootstrap            deliver every existing row as INSERT, then exit
      |                         (with --cdc: tail the log after the snapshot)
      |  --cdc                  continuously drain the change log
      |  --output <dest>        '-' stdout text | 'json' stdout JSON | http(s) URL POST
      |  --batch-size <n>       max changes per delivered batch (default 256)
      |  --disable-subsec       second-resolution timestamps (old SQLite clients)
      |  --blobs                include BLOB columns (upper-case hex)
      |  --poll-ms <n>          cdc poll interval in milliseconds (default 100)
      |  --dead-letter <dest>   side sink for poison rows (same forms as --output);
      |                         without it one unparseable row wedges the log
      |  --available-now        drain what exists and exit instead of tailing
      |  --ignore-drift         downgrade the startup schema-drift check to a warning
      |  --watch <file>         wake the cdc loop on db/-wal/-shm file events
      |                         (fsnotify parity) instead of pure interval polling
      |""".stripMargin

  def parse(args: Seq[String]): Either[String, Config] = {
    def intArg(name: String, v: String): Either[String, Int] =
      v.toIntOption.toRight(s"$name expects an integer, got: $v")
    @annotation.tailrec
    def go(rest: List[String], c: Config): Either[String, Config] = rest match {
      case Nil => Right(c)
      case "--db" :: v :: t            => go(t, c.copy(db = Some(v)))
      case "--db-params" :: v :: t     => go(t, c.copy(dbParams = Some(v)))
      case "--log-dir" :: v :: t       => go(t, c.copy(logDir = Some(v)))
      case "--snapshot-dir" :: v :: t  => go(t, c.copy(snapshotDir = Some(v)))
      case "--table" :: v :: t         => go(t, c.copy(tables = c.tables :+ v))
      case "--log-table" :: v :: t     => go(t, c.copy(logTable = v))
      case "--setup" :: t              => go(t, c.copy(setup = true))
      case "--teardown" :: t           => go(t, c.copy(teardown = true))
      case "--bootstrap" :: t          => go(t, c.copy(bootstrap = true))
      case "--cdc" :: t                => go(t, c.copy(cdc = true))
      case "--output" :: v :: t        => go(t, c.copy(output = v))
      case "--batch-size" :: v :: t    =>
        intArg("--batch-size", v) match {
          case Right(n) => go(t, c.copy(batchSize = n))
          case Left(e)  => Left(e)
        }
      case "--disable-subsec" :: t     => go(t, c.copy(disableSubsec = true))
      case "--blobs" :: t              => go(t, c.copy(blobs = true))
      case "--poll-ms" :: v :: t       =>
        intArg("--poll-ms", v) match {
          case Right(n) => go(t, c.copy(pollMs = n.toLong))
          case Left(e)  => Left(e)
        }
      case "--available-now" :: t      => go(t, c.copy(availableNow = true))
      case "--ignore-drift" :: t       => go(t, c.copy(ignoreDrift = true))
      case "--watch" :: v :: t         => go(t, c.copy(watchFile = Some(v)))
      case "--dead-letter" :: v :: t   => go(t, c.copy(deadLetter = Some(v)))
      case ("--help" | "-h") :: _      => Left(usage)
      case other :: _                  => Left(s"unknown flag: $other\n$usage")
    }
    go(args.toList, Config()).flatMap(validate)
  }

  private def validate(c: Config): Either[String, Config] = {
    if (c.db.isEmpty && c.logDir.isEmpty)
      Left("one of --db or --log-dir is required")
    else if (c.db.nonEmpty && c.logDir.nonEmpty)
      Left("--db and --log-dir are mutually exclusive")
    else if (!c.teardown && !c.setup && !c.cdc && !c.bootstrap)
      Left("at least one of cdc or bootstrap must be set") // main.go:137
    else if ((c.setup || c.teardown) && c.tables.isEmpty)
      Left("--setup/--teardown require at least one --table")
    else if ((c.setup || c.teardown) && c.logDir.nonEmpty)
      Left("--setup/--teardown install capture on the source database; " +
        "they require --db, not --log-dir")
    else if (c.bootstrap && c.logDir.nonEmpty && c.snapshotDir.isEmpty)
      Left("--bootstrap with --log-dir requires --snapshot-dir")
    else if (c.batchSize <= 0)
      Left(s"--batch-size must be positive, got ${c.batchSize} " +
        "(0 would make the cdc loop spin without ever delivering)")
    else if (c.pollMs <= 0)
      Left(s"--poll-ms must be positive, got ${c.pollMs}")
    else Right(c)
  }

  /** Sink from `--output` (main.go:86-97 switch parity). */
  def handlerFor(output: String): ChangesHandler = output match {
    case "-"    => new ConsoleHandler
    case "json" => new JsonConsoleHandler
    case url    => new HttpPostHandler(url)
  }

  /** Connection-parameter separator differs by driver: the xerial
    * SQLite driver takes `?k=v&k=v` (a ';' would be folded into the file
    * PATH, silently opening a different database); Derby and most others
    * take `;k=v`. Respect an explicit separator if the params already
    * start with one. */
  private[cdc] def jdbcUrl(c: Config): String =
    c.db.get + c.dbParams.fold("") { p =>
      if (p.isEmpty) ""
      else if (p.startsWith(";") || p.startsWith("?") || p.startsWith("&")) p
      else if (c.db.get.startsWith("jdbc:sqlite:"))
        (if (c.db.get.contains("?")) "&" else "?") + p
      else s";$p"
    }

  /** Run the configured modes. `introspect` and side effects are
    * injectable so the suite can drive every mode end-to-end without a
    * live SQLite (no sqlite driver exists in the build sandbox — Derby
    * and parquet logs stand in; the generated DDL is byte-parity-tested
    * in CdcDdlSpec instead).
    * @return number of changes delivered (0 for setup/teardown-only) */
  def run(
      c: Config,
      spark: SparkSession,
      introspect: (java.sql.Connection, Seq[String]) => SqliteCatalog.DbMeta =
        SqliteCatalog.introspect,
      execDdl: (JdbcChangeLog, Seq[String]) => Unit = _.executeDdl(_),
      readTriggers: (java.sql.Connection, Seq[String]) => Map[String, String] =
        CdcDrift.installedTriggers,
      onEngine: CdcEngine => Unit = _ => ()): Long = {
    val ddlOpts = CdcDdl.Options(
      logTable = c.logTable,
      blobSupport = c.blobs,
      subsecTimestamps = !c.disableSubsec)

    // setup/teardown: introspect the source schema, run the capture DDL
    // in one transaction (reference triggers.go:334-395).
    def withMetas[A](f: Seq[SqliteCatalog.TableMeta] => A): A = {
      val conn = java.sql.DriverManager.getConnection(jdbcUrl(c))
      try f(introspect(conn, c.tables).tables)
      finally conn.close()
    }
    lazy val jdbcLog = new JdbcChangeLog(jdbcUrl(c), logTable = c.logTable)
    if (c.setup && c.db.nonEmpty)
      withMetas(m => execDdl(jdbcLog, CdcDdl.setupStatements(m, ddlOpts)))
    if (c.teardown) {
      if (c.db.nonEmpty)
        withMetas(m => execDdl(jdbcLog, CdcDdl.teardownStatements(m, ddlOpts)))
      return 0L // teardown prevents any other action (main.go:113-118)
    }
    if (!c.cdc && !c.bootstrap) return 0L // setup-only invocation

    // Startup schema-drift guard (SURVEY.md §7.4-4): the triggers froze
    // the column list at setup time; an ALTER TABLE since then makes the
    // captured images diverge from the live schema. Fail-stop by
    // default; --ignore-drift downgrades to a warning.
    if (c.db.nonEmpty && c.tables.nonEmpty && !c.setup) {
      val conn = java.sql.DriverManager.getConnection(jdbcUrl(c))
      val drifts =
        try CdcDrift.check(conn, c.tables, ddlOpts, introspect, readTriggers)
        finally conn.close()
      if (drifts.nonEmpty) {
        val msg = drifts.mkString("schema drift detected:\n  ", "\n  ", "")
        if (c.ignoreDrift) System.err.println(s"graft-cdc: WARNING: $msg")
        else throw new IllegalStateException(
          s"$msg\n(re-run --setup, or pass --ignore-drift to proceed)")
      }
    }

    val log: ChangeLog = c.logDir match {
      case Some(dir) => new ParquetChangeLog(dir)
      case None      => jdbcLog
    }
    val engine = new CdcEngine(spark, log, handlerFor(c.output),
      maxBatchSize = c.batchSize, pollIntervalMs = c.pollMs,
      subsecTimestamps = !c.disableSubsec,
      wakeup = c.watchFile.fold[Wakeup](Wakeup.poll())(new FileWakeup(_)),
      deadLetter = c.deadLetter.map(handlerFor))
    onEngine(engine)

    def snapshots: Seq[(String, DataFrame)] = c.tables.map { t =>
      c.logDir match {
        case Some(_) =>
          t -> spark.read.parquet(s"${c.snapshotDir.get}/$t.parquet")
        case None =>
          t -> spark.read.format("jdbc")
            .option("url", jdbcUrl(c)).option("dbtable", t).load()
      }
    }

    try {
      (c.bootstrap, c.cdc) match {
        case (true, false) => engine.bootstrap(snapshots, c.blobs)
        case (false, true) =>
          if (c.availableNow) engine.cdcAvailableNow()
          else { engine.cdc(); 0L }
        case (true, true) =>
          if (c.availableNow) engine.bootstrapAndCdcAvailableNow(snapshots, c.blobs)
          else { engine.bootstrapAndCdc(snapshots, c.blobs); 0L }
        case (false, false) => 0L // unreachable post-validate
      }
    } finally engine.close() // releases the wakeup watch handle in every mode
  }

  /** CLI failure line: exception message, else the class name — an NPE
    * or similar message-less failure must not print "graft-cdc: null". */
  private[cdc] def diagnostic(e: Throwable): String =
    Option(e.getMessage).getOrElse(e.getClass.getName)

  def main(args: Array[String]): Unit = {
    parse(args.toIndexedSeq) match {
      case Left(err) =>
        System.err.println(err)
        sys.exit(if (err == usage) 0 else 2)
      case Right(c) =>
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
          .appName("graft-cdc")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        try {
          // SIGINT-clean: stop the tail loop, let the current batch ack
          // (reference signal.NotifyContext parity, main.go:50-52).
          run(c, spark, onEngine = { e =>
            Runtime.getRuntime.addShutdownHook(new Thread(() => e.close()))
          }): Unit
        } catch {
          case e: Throwable =>
            System.err.println(s"graft-cdc: ${diagnostic(e)}")
            sys.exit(1)
        } finally spark.stop()
    }
  }
}
