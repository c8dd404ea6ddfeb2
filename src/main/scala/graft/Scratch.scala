package graft

/** Scratch-directory anchor for query bodies, benches, and generators
  * that need a writable warehouse/index dir. Anchored at the process
  * working directory's `target/` (override with `GRAFT_SCRATCH_DIR`),
  * absolutized so Spark catalog configs and Hadoop paths resolve the
  * same place regardless of each component's own cwd handling — no
  * checkout-absolute literals anywhere in src/main (ADVICE r13/r14).
  */
object Scratch {
  def dir(name: String): String =
    new java.io.File(sys.env.getOrElse("GRAFT_SCRATCH_DIR", "target"), name)
      .getAbsolutePath
}
