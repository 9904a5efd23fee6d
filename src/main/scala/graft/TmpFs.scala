package graft

/** The single probe for the sandbox's RAM disk. Bench measurements,
  * serving indexes and index caches live on /dev/shm when present so
  * they capture the engine, not the virtio disk — and the serving-qps
  * floor calibration depends on exactly the same condition, so the
  * decision must come from ONE place (six call sites previously
  * probed independently). */
object TmpFs {
  def available: Boolean = new java.io.File("/dev/shm").isDirectory
  def base: String = if (available) "/dev/shm" else "/tmp"
  def basePath: java.nio.file.Path = java.nio.file.Paths.get(base)
}
