package graft.sources

/**
 * Named connections (reference: odibi/connections/ — BaseConnection.
 * get_path resolution in base.py/local.py; azure_adls/local_dbfs/postgres
 * variants). Spark needs no per-provider client code — s3a://, abfss://,
 * dbfs:/ and local paths are all just base URIs to the Hadoop FS layer —
 * so a connection here is a base URI (or JDBC URL) plus default reader/
 * writer options. Nodes reference a connection by name with a relative
 * path; credentials and endpoints live once at project level, exactly the
 * reference's separation of concerns.
 */
object Connections {

  /**
   * kind ∈ file | jdbc. For `file`, `base` is a base URI and `path`s
   * resolve under it. For `jdbc`, `base` is the JDBC URL and options
   * (user/password/driver/...) merge into the reader's options with the
   * node's own options winning.
   */
  final case class Connection(kind: String, base: String,
                              options: Map[String, String] = Map.empty) {
    def resolvePath(rel: String): String =
      if (rel.isEmpty) base
      else if (rel.contains("://") || rel.startsWith("/")) rel // already absolute
      else base.stripSuffix("/") + "/" + rel
  }

  /** Resolve a read config against a connection map. */
  def applyToRead(cfg: Sources.ReadConfig, connection: Option[String],
                  connections: Map[String, Connection]): Sources.ReadConfig =
    connection match {
      case None => cfg
      case Some(name) =>
        val c = connections.getOrElse(name,
          throw new IllegalArgumentException(
            s"unknown connection '$name'; available: ${connections.keys.toSeq.sorted.mkString(", ")}"))
        c.kind match {
          case "jdbc" => cfg.copy(format = "jdbc",
            options = c.options ++ Map("url" -> c.base) ++ cfg.options)
          case _ => cfg.copy(
            path = cfg.path.map(c.resolvePath).orElse(Some(c.base)),
            options = c.options ++ cfg.options)
        }
    }

  /** Resolve a write path + config against a connection map. JDBC
    * connections are read-side only here — declarative JDBC writes go
    * through the SQL Server MERGE writer API, so a jdbc connection on a
    * write block fails at LOAD time instead of surfacing later as a
    * "no filesystem for scheme jdbc" runtime crash. */
  def applyToWrite(path: Option[String], cfg: Sources.WriteConfig,
                   connection: Option[String],
                   connections: Map[String, Connection])
      : (Option[String], Sources.WriteConfig) =
    connection match {
      case None => (path, cfg)
      case Some(name) =>
        val c = connections.getOrElse(name,
          throw new IllegalArgumentException(
            s"unknown connection '$name'; available: ${connections.keys.toSeq.sorted.mkString(", ")}"))
        require(c.kind != "jdbc",
          s"connection '$name': jdbc connections are not supported on write " +
            "blocks (use SqlServerWriter / the jdbc writer API)")
        (path.map(c.resolvePath).orElse(Some(c.base)),
          cfg.copy(options = c.options ++ cfg.options))
    }
}
