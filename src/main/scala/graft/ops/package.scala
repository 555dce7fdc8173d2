package graft

/** Shared conventions for the declared-query modules. */
package object ops {

  /** Scratch directory for queries that exercise a real write+read-back
    * (sources, sinks, persisted indexes). One path convention for the
    * whole suite: the SF token keeps its dot so distinct SFs never
    * collide ("/tmp/graft_io/<name>-0.01"). */
  private[graft] def ioDir(dir: String, name: String): String = {
    val sf = dir.replaceAll("[^0-9.]", "")
    s"/tmp/graft_io/$name-$sf"
  }
}
