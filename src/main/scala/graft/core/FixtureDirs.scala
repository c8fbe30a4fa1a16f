package graft.core

/** Per-application scratch directories for round-trip fixtures (q84/q85/
  * q94/q96/q109): keyed by Spark applicationId so concurrent JVMs (bench +
  * correctness run) never race on one overwrite target, and registered for
  * recursive deletion on JVM exit so repeated runs don't accumulate dirs
  * under target/.
  */
object FixtureDirs {

  private val registered =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Returns `base/appId`, scheduling the whole dir for deletion at exit
    * (idempotent per path).
    */
  def perApp(base: String, appId: String): String = {
    val dir = s"$base/$appId"
    if (registered.putIfAbsent(dir, java.lang.Boolean.TRUE) == null)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        deleteRecursively(new java.io.File(dir))))
    dir
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
