package graft.pipeline

/** C1 — typed config surface, mirroring the reference's five env knobs
  * (`migration.py:17-23`, `.env.example`): input CSV, sink location,
  * overwrite-vs-append, log dir. Mongo URI/DB have no Spark analog
  * (sinks are parquet paths).
  */
final case class PipelineConfig(
    csvPath: String,
    outDir: String,
    overwrite: Boolean = true,
    logDir: String = "logs")

object PipelineConfig {
  /** Env-driven construction with the reference's defaults-from-env
    * pattern; `GRAFT_OVERWRITE` parallels `DROP_COLLECTIONS`
    * (`migration.py:21`, README.md:132-133) and `GRAFT_LOG_DIR`
    * parallels `LOG_DIR` (`.env.example:5`, `migration.py:28-33`).
    */
  def fromEnv(env: Map[String, String] = sys.env): PipelineConfig =
    PipelineConfig(
      csvPath = env.getOrElse("GRAFT_CSV_PATH", "data/healthcare_dataset.csv"),
      outDir = env.getOrElse("GRAFT_OUT_DIR", "out/healthcare"),
      overwrite = env.getOrElse("GRAFT_OVERWRITE", "true").toBoolean,
      logDir = env.getOrElse("GRAFT_LOG_DIR", "logs"))
}
