package graft.core

/**
 * Recipe system (reference: odibi/recipes/__init__.py): reusable
 * node-level templates with `${recipe.var}` substitution, single-parent
 * inheritance (`extends`, child wins, cycles detected) and deep-merge
 * expansion where the NODE's own keys win over the template (dicts merge
 * recursively, lists/scalars replace). A full-string placeholder keeps
 * the variable's original type (lists stay lists); embedded placeholders
 * stringify — both exactly the reference's substitution rules.
 *
 * Built-ins mirror the reference's bronze/silver layer recipes
 * (recipes/builtins/ bronze.yaml, silver.yaml) re-expressed over this
 * library's surface.
 */
object Recipes {

  final case class Recipe(description: Option[String] = None,
                          extendsRecipe: Option[String] = None,
                          requiredVars: Seq[String] = Nil,
                          optionalVars: Map[String, Any] = Map.empty,
                          template: Map[String, Any] = Map.empty)

  /** Fields that belong to the node, never to a template. */
  private val reservedNodeFields = Set("name", "recipe", "recipe_vars")

  private val varPattern = "\\$\\{recipe\\.([a-zA-Z_][a-zA-Z0-9_]*)\\}".r

  /** Built-in recipes (usable without a `recipes:` block). */
  val builtins: Map[String, Recipe] = Map(
    // CSV → parquet bronze ingestion: normalized names + dedup + append
    "csv_bronze_load" -> Recipe(
      description = Some("CSV to parquet bronze load with column normalization and dedup"),
      requiredVars = Seq("path", "keys"),
      optionalVars = Map("header" -> "true"),
      template = Map(
        "read" -> Map("format" -> "csv", "path" -> "${recipe.path}",
          "options" -> Map("header" -> "${recipe.header}", "inferSchema" -> "true")),
        "steps" -> Seq(
          Map("function" -> "normalize_column_names"),
          Map("operation" -> "drop_duplicates",
            "params" -> Map("subset" -> "${recipe.keys}"))),
        "write" -> Map("format" -> "parquet", "mode" -> "append"))),
    // SCD2 silver dimension load through the warehouse pattern
    "scd2_silver_load" -> Recipe(
      description = Some("SCD2 dimension load via the scd2 pattern"),
      requiredVars = Seq("keys", "compare_columns"),
      template = Map(
        "transformer" -> "scd2",
        "params" -> Map("keys" -> "${recipe.keys}",
          "compare_columns" -> "${recipe.compare_columns}"))),
    // validated load: PK tests + quarantine routing
    "validated_load" -> Recipe(
      description = Some("Load with PK uniqueness/not-null tests and quarantine routing"),
      requiredVars = Seq("key_column", "quarantine_path"),
      template = Map(
        "validation" -> Map(
          "tests" -> Seq(
            Map("name" -> "pk_not_null", "kind" -> "not_null",
              "columns" -> Seq("${recipe.key_column}"), "severity" -> "quarantine"),
            Map("name" -> "pk_unique", "kind" -> "unique",
              "columns" -> Seq("${recipe.key_column}"))),
          "quarantine" -> Map("path" -> "${recipe.quarantine_path}")))))

  private def parseRecipe(name: String, v: Any): Recipe = v match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      val unknown = mm.keySet -- Set("description", "extends", "required_vars",
        "optional_vars", "template")
      require(unknown.isEmpty, s"recipe $name: unknown keys $unknown")
      val template = mm.getOrElse("template",
        throw new IllegalArgumentException(s"recipe $name: no template"))
        .asInstanceOf[Map[String, Any]]
      val reserved = template.keySet.intersect(reservedNodeFields)
      require(reserved.isEmpty,
        s"recipe $name: template may not set node-reserved fields $reserved")
      Recipe(
        description = mm.get("description").map(_.toString),
        extendsRecipe = mm.get("extends").map(_.toString),
        requiredVars = mm.getOrElse("required_vars", Nil)
          .asInstanceOf[Seq[Any]].map(_.toString),
        optionalVars = mm.getOrElse("optional_vars", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]],
        template = template)
    case other => throw new IllegalArgumentException(s"recipe $name: not a mapping: $other")
  }

  /** Inheritance resolution: child template/vars win; cycles rejected. */
  private def resolveInheritance(recipes: Map[String, Recipe]): Map[String, Recipe] = {
    val resolved = scala.collection.mutable.Map.empty[String, Recipe]
    def resolve(name: String, chain: List[String]): Recipe = resolved.getOrElse(name, {
      require(!chain.contains(name),
        s"circular recipe inheritance: ${(chain :+ name).mkString(" -> ")}")
      val r = recipes.getOrElse(name,
        throw new IllegalArgumentException(
          s"recipe '${chain.lastOption.getOrElse(name)}' extends unknown recipe '$name'"))
      val out = r.extendsRecipe match {
        case None => r
        case Some(parentName) =>
          val p = resolve(parentName, chain :+ name)
          Recipe(
            description = r.description.orElse(p.description),
            extendsRecipe = None,
            requiredVars = p.requiredVars.filterNot(r.requiredVars.contains) ++ r.requiredVars,
            optionalVars = p.optionalVars ++ r.optionalVars,
            template = deepMerge(p.template, r.template))
      }
      resolved(name) = out
      out
    })
    recipes.keys.foreach(resolve(_, Nil))
    resolved.toMap
  }

  /** dict+dict → recursive merge (overrides win); list/scalar → replace. */
  private def deepMerge(base: Map[String, Any],
                        overrides: Map[String, Any]): Map[String, Any] =
    overrides.foldLeft(base) { case (acc, (k, v)) =>
      (acc.get(k), v) match {
        case (Some(bm: Map[_, _]), vm: Map[_, _]) =>
          acc + (k -> deepMerge(bm.asInstanceOf[Map[String, Any]],
            vm.asInstanceOf[Map[String, Any]]))
        case _ => acc + (k -> v)
      }
    }

  /** `${recipe.x}` substitution with type preservation on full match. */
  private def substitute(obj: Any, vars: Map[String, Any], recipe: String): Any = obj match {
    case s: String =>
      varPattern.findFirstMatchIn(s) match {
        case Some(m) if m.start == 0 && m.end == s.length =>
          vars.getOrElse(m.group(1), throw new IllegalArgumentException(
            s"recipe '$recipe': variable '$${recipe.${m.group(1)}}' not in recipe_vars; " +
              s"available: ${vars.keys.toSeq.sorted.mkString(", ")}"))
        case _ =>
          varPattern.replaceAllIn(s, m =>
            java.util.regex.Matcher.quoteReplacement(
              vars.getOrElse(m.group(1), throw new IllegalArgumentException(
                s"recipe '$recipe': variable '$${recipe.${m.group(1)}}' not in recipe_vars; " +
                  s"available: ${vars.keys.toSeq.sorted.mkString(", ")}")).toString))
      }
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].map { case (k, v) =>
        k -> substitute(v, vars, recipe)
      }
    case l: Seq[_] => l.map(substitute(_, vars, recipe))
    case other => other
  }

  /**
   * Expand every `recipe:` node in a loaded project map. Inline `recipes:`
   * definitions override built-ins of the same name; the `recipes:` key is
   * consumed. Node keys always win over the expanded template.
   */
  def resolve(root: Map[String, Any]): Map[String, Any] = {
    val inline = root.get("recipes").map(_.asInstanceOf[Map[String, Any]]
      .map { case (n, v) => n -> parseRecipe(n, v) }).getOrElse(Map.empty)
    val registry = resolveInheritance(builtins ++ inline)
    val nodes = root.getOrElse("nodes", Nil).asInstanceOf[Seq[Any]].map {
      case m: Map[_, _] if m.asInstanceOf[Map[String, Any]].contains("recipe") =>
        val node = m.asInstanceOf[Map[String, Any]]
        val name = node.getOrElse("name", "<unnamed>").toString
        val recipeName = node("recipe").toString
        val recipe = registry.getOrElse(recipeName,
          throw new IllegalArgumentException(
            s"node $name: unknown recipe '$recipeName'; " +
              s"available: ${registry.keys.toSeq.sorted.mkString(", ")}"))
        val vars0 = node.getOrElse("recipe_vars", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]]
        val missing = recipe.requiredVars.filterNot(vars0.contains)
        require(missing.isEmpty,
          s"node $name: recipe '$recipeName' missing required vars: ${missing.mkString(", ")}")
        val vars = recipe.optionalVars ++ vars0
        val expanded = substitute(recipe.template, vars, recipeName)
          .asInstanceOf[Map[String, Any]]
        deepMerge(expanded, node - "recipe" - "recipe_vars")
      case other => other
    }
    (root - "recipes") + ("nodes" -> nodes)
  }
}
