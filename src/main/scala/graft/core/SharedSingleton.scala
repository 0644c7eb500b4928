package graft.core

import scala.collection.concurrent.TrieMap

/** Per-JVM lazily-initialized shared state, survives task serialization by
  * re-resolving from a process-wide registry keyed by owner id
  * (ref pattern: core/.../io/http/SharedVariable.scala:1-64 — per-executor-JVM
  * pooled resources like HTTP clients, consolidator queues).
  *
  * Serializable holder: only the key and the (serializable) factory closure
  * ship with the task; the value is created at most once per JVM.
  */
class SharedSingleton[T](key: String, factory: () => T) extends Serializable {
  def get: T = SharedSingleton.registry
    .getOrElseUpdate(key, factory()).asInstanceOf[T]
}

object SharedSingleton {
  private val registry = TrieMap.empty[String, Any]
  def apply[T](key: String)(factory: => T): SharedSingleton[T] =
    new SharedSingleton[T](key, () => factory)
  private[graft] def remove(key: String): Unit = registry.remove(key)
}
