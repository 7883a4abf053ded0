package graft

/**
 * Dry-run entry point: validate a pipeline YAML and print the planner's
 * JSON response (logical plan + diagnostics) without starting Spark.
 *
 *   spark-class ... graft.Plan path/to/project.yaml
 *
 * Exit code 0 when the config is valid, 1 otherwise — usable as a CI
 * gate (reference: odibi planning API, planning.py PlanningResponse).
 */
object Plan {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: graft.Plan <project.yaml>")
    val response = graft.core.Planner.planFile(args(0))
    println(response.toJson)
    if (!response.valid) sys.exit(1)
  }
}
