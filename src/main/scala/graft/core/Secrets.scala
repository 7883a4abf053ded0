package graft.core

/**
 * Config placeholder + secret resolution (reference: odibi/cli/secrets.py
 * ENV_PATTERN and odibi/utils/config_loader.py load_yaml_with_env — the
 * `${VAR}` / `${env:VAR}` forms resolved from the process environment and
 * a `.env` file; Key Vault backends are env-blocked here and stay out).
 *
 * Resolution order: explicit `--set` pairs win, then the process
 * environment, then a `.env` file next to the config. Unresolved
 * placeholders stay verbatim so the planner's path/validation
 * diagnostics name them downstream instead of silently blanking.
 *
 * Recipe variables (`${recipe.x}`) contain a dot, which this pattern
 * deliberately does not match — they resolve at recipe-expansion time,
 * never from the environment.
 */
object Secrets {

  private val Pattern = """\$\{(?:env:)?([A-Za-z0-9_]+)\}""".r

  /** All placeholder names used in the text. */
  def placeholders(text: String): Set[String] =
    Pattern.findAllMatchIn(text).map(_.group(1)).toSet

  /**
   * KEY=VALUE pairs from `baseDir/.env` when present (comments, blanks,
   * an optional `export ` prefix, and single/double quoting accepted —
   * the common dotenv subset). Malformed lines are skipped, not fatal.
   */
  def loadDotEnv(baseDir: Option[String]): Map[String, String] = {
    val file = java.nio.file.Paths.get(baseDir.getOrElse("."), ".env")
    if (!java.nio.file.Files.isReadable(file)) return Map.empty
    java.nio.file.Files.readAllLines(file).toArray(Array.empty[String]).toSeq
      .map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .map(l => if (l.startsWith("export ")) l.stripPrefix("export ").trim else l)
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) if k.nonEmpty =>
            val unquoted = v.trim match {
              case q if q.length >= 2 && (q.startsWith("\"") && q.endsWith("\"")
                || q.startsWith("'") && q.endsWith("'")) => q.substring(1, q.length - 1)
              case other => other
            }
            Some(k.trim -> unquoted)
          case _ => None
        }
      }.toMap
  }

  /** Substitute every resolvable placeholder; leave the rest verbatim. */
  def substitute(text: String, sets: Map[String, String],
                 baseDir: Option[String],
                 env: Map[String, String] = sys.env): String = {
    val dotenv = loadDotEnv(baseDir)
    Pattern.replaceAllIn(text, m => {
      val k = m.group(1)
      java.util.regex.Matcher.quoteReplacement(
        sets.get(k).orElse(env.get(k)).orElse(dotenv.get(k))
          .getOrElse(m.matched))
    })
  }

  /** Placeholders with no value in sets, env, or `.env`, sorted. */
  def missing(text: String, sets: Map[String, String],
              baseDir: Option[String],
              env: Map[String, String] = sys.env): Seq[String] = {
    val dotenv = loadDotEnv(baseDir)
    (placeholders(text) -- sets.keySet -- env.keySet -- dotenv.keySet)
      .toSeq.sorted
  }
}
