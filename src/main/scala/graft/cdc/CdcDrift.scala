package graft.cdc

import SqliteCatalog.TableMeta

/** Schema-drift detection (SURVEY.md §7.4-4). The capture triggers
  * freeze a table's column list at setup time; an ALTER TABLE afterwards
  * silently drops (or breaks) capture of the new shape in the reference.
  * This guard re-introspects at engine start and compares the trigger
  * SQL actually installed (sqlite_master keeps the CREATE TRIGGER text
  * verbatim) against the DDL the CURRENT schema would generate — the
  * golden-stable CdcDdl output makes that a pure string equality.
  */
object CdcDrift {

  /** One detected problem, human-readable and machine-usable. */
  final case class Drift(table: String, trigger: String, kind: String) {
    override def toString: String = kind match {
      case "missing" => s"table $table: trigger $trigger is not installed"
      case "stale"   => s"table $table: trigger $trigger does not match the DDL " +
        "the current schema and capture options would generate (ALTER TABLE " +
        "after setup, or different --blobs/--disable-subsec/--log-table flags " +
        "than were used at --setup time?)"
      case k => s"table $table: $trigger: $k"
    }
  }

  /** The trigger set the current schema would produce. */
  def expectedTriggers(metas: Seq[TableMeta], o: CdcDdl.Options): Map[String, String] =
    metas.flatMap { t =>
      Seq(Operation.Insert, Operation.Update, Operation.Delete).map { op =>
        CdcDdl.triggerName(t.name, op) -> (op match {
          case Operation.Insert => CdcDdl.createInsertTrigger(t, o)
          case Operation.Update => CdcDdl.createUpdateTrigger(t, o)
          case _                => CdcDdl.createDeleteTrigger(t, o)
        })
      }
    }.toMap

  /** Pure comparison: expected trigger DDL vs what is installed.
    * SQLite stores the executed CREATE TRIGGER text verbatim, minus an
    * implementation-defined treatment of `IF NOT EXISTS`, so comparison
    * is whitespace-normalized and IF-NOT-EXISTS-insensitive. */
  def diff(expected: Map[String, String], installed: Map[String, String],
      tableOf: String => String = _.split("__cdc_").head): Seq[Drift] =
    expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      installed.get(name) match {
        case None => Some(Drift(tableOf(name), name, "missing"))
        case Some(have) if canon(have) != canon(want) =>
          Some(Drift(tableOf(name), name, "stale"))
        case _ => None
      }
    }

  private def canon(sql: String): String =
    sql.replaceAll("(?i)IF NOT EXISTS ", "").replaceAll("\\s+", " ").trim

  /** Declared-type drift against the schema frozen at setup time (the
    * CdcDdl schema side table). Catches what trigger text cannot: a
    * non-BLOB declared-type change (INTEGER → TEXT) renders identical
    * capture DDL but changes how consumers parse the images
    * (reference frozen-schema semantics, dbmeta.go:46 + triggers.go:69).
    * Pure; tables absent from the freeze are skipped (add/drop shows up
    * as stale trigger text already). */
  def schemaDiff(frozen: Map[String, Seq[SqliteCatalog.ColumnMeta]],
      current: Seq[TableMeta]): Seq[Drift] =
    current.filter(t => frozen.contains(t.name)).flatMap { t =>
      val f = frozen(t.name).map(c => c.name -> c).toMap
      val cur = t.columns.map(c => c.name -> c).toMap
      val dropped = (f.keySet -- cur.keySet).toSeq.sorted.map(n =>
        Drift(t.name, s"column $n", "dropped since setup"))
      val added = (cur.keySet -- f.keySet).toSeq.sorted.map(n =>
        Drift(t.name, s"column $n", "added since setup"))
      val changed = (f.keySet intersect cur.keySet).toSeq.sorted.flatMap { n =>
        val (was, is) = (f(n), cur(n))
        val retyped =
          if (was.declType != is.declType)
            Some(Drift(t.name, s"column $n",
              s"declared type changed since setup (${was.declType} -> ${is.declType})"))
          else None
        val rekeyed =
          if (was.pkOrdinal != is.pkOrdinal)
            Some(Drift(t.name, s"column $n",
              s"primary-key position changed since setup (${was.pkOrdinal} -> ${is.pkOrdinal})"))
          else None
        retyped.toSeq ++ rekeyed
      }
      dropped ++ added ++ changed
    }

  /** The schema frozen at setup time, from the CdcDdl side table; None
    * when the side table is absent (setup predates the schema freeze) —
    * drift detection then falls back to trigger-text comparison only.
    * Absence is probed explicitly via JDBC catalog metadata: any OTHER
    * failure (lock contention, I/O, permissions) propagates, because a
    * drift GUARD that fails open on transient errors reports "no
    * drift" exactly when it could not look. */
  def frozenSchema(conn: java.sql.Connection, tables: Seq[String],
      o: CdcDdl.Options): Option[Map[String, Seq[SqliteCatalog.ColumnMeta]]] = {
    val name = CdcDdl.schemaTableName(o)
    val md = conn.getMetaData
    // getTables takes a LIKE pattern, but drivers disagree on escape
    // handling (Derby honors getSearchStringEscape; sqlite-jdbc's
    // support is inconsistent across versions, and some drivers return
    // null for the escape string). An escaped pattern a driver doesn't
    // understand never matches — silently reporting "absent", the
    // exact fail-open this probe exists to close. So probe
    // driver-agnostically: pass the UNESCAPED name (its underscores
    // are single-char wildcards, which can only over-match, never
    // under-match) restricted to TABLE types, and exact-compare each
    // row's TABLE_NAME.
    val exists = {
      val r = md.getTables(null, null, name, Array("TABLE"))
      try {
        var found = false
        while (!found && r.next()) found = r.getString("TABLE_NAME") == name
        found
      } finally r.close()
    }
    if (!exists) None
    else {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"SELECT tablename, name, decltype, pk FROM ${CdcDdl.qi(name)}")
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(String, SqliteCatalog.ColumnMeta)]
        while (rs.next())
          buf += rs.getString(1) -> SqliteCatalog.ColumnMeta(
            rs.getString(2), rs.getString(3), rs.getInt(4))
        rs.close()
        Some(buf.filter(r => tables.contains(r._1))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap)
      } finally st.close()
    }
  }

  /** Installed capture triggers for the monitored tables, from
    * sqlite_master (works over any JDBC driver that reaches SQLite). */
  def installedTriggers(conn: java.sql.Connection, tables: Seq[String]): Map[String, String] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        "SELECT name, sql FROM sqlite_master WHERE type = 'trigger'")
      val buf = scala.collection.mutable.Map.empty[String, String]
      while (rs.next()) {
        val n = rs.getString(1)
        if (tables.exists(t => n.startsWith(s"${t}__cdc_")))
          buf += n -> rs.getString(2)
      }
      rs.close()
      buf.toMap
    } finally st.close()
  }

  /** Full check at engine start: introspect the current schema, compare
    * installed trigger text AND the setup-frozen column types against
    * it. Empty result = no drift. */
  def check(
      conn: java.sql.Connection,
      tables: Seq[String],
      o: CdcDdl.Options,
      introspect: (java.sql.Connection, Seq[String]) => SqliteCatalog.DbMeta =
        SqliteCatalog.introspect,
      readTriggers: (java.sql.Connection, Seq[String]) => Map[String, String] =
        installedTriggers,
      readSchema: (java.sql.Connection, Seq[String], CdcDdl.Options) =>
        Option[Map[String, Seq[SqliteCatalog.ColumnMeta]]] = frozenSchema): Seq[Drift] = {
    val current = introspect(conn, tables).tables
    diff(expectedTriggers(current, o), readTriggers(conn, tables)) ++
      readSchema(conn, tables, o).map(schemaDiff(_, current)).getOrElse(Nil)
  }
}
