package graft.compiler

import graft.core.{GraftOperator, StreamElement, ValueSerializer}

/** Runtime support for generated typed models ([[ModelGenerator]]) — the
  * analog of the reference's generated wrapper methods over entity
  * attributes (reference: compiler/lib/.../ModelGenerator.java, template
  * java-source.ftlh; the generated model exposes one typed accessor per
  * attribute with get/upsert/delete against the operator).
  *
  * The generated source only ever references these two classes plus the
  * serializer registry, so the emitted code stays small and the behavior
  * stays in ONE reviewed place.
  */
final class TypedAttribute[T](op: GraftOperator, val entityName: String,
    val attrName: String, ser: ValueSerializer[T]) extends Serializable {

  def descriptor: graft.core.AttributeDescriptor =
    op.repo.entity(entityName).attribute(attrName).getOrElse(
      throw new IllegalStateException(s"$entityName.$attrName vanished from config"))

  def upsert(key: String, stamp: Long, value: T): Unit =
    op.write(StreamElement.upsert(entityName, key, attrName,
      java.util.UUID.randomUUID().toString, stamp, ser.serialize(value)))

  def delete(key: String, stamp: Long): Unit =
    op.write(StreamElement.delete(entityName, key, attrName,
      java.util.UUID.randomUUID().toString, stamp))

  def get(key: String, asOf: Long = Long.MaxValue): Option[T] =
    op.getRandomAccess(entityName, attrName).get(key, attrName, asOf)
      .flatMap(e => ser.deserialize(e.value))
}

/** Typed surface of a wildcard attribute family `prefix.*`: accessors take
  * the suffix; `deleteWildcard` writes the whole-prefix tombstone
  * (reference: StreamElement.java:145 wildcard deletes).
  */
final class TypedWildcardAttribute[T](op: GraftOperator, val entityName: String,
    val prefix: String, ser: ValueSerializer[T]) extends Serializable {

  private def attr(suffix: String): String = prefix + suffix
  private def wildcardName: String = prefix + "*"

  def upsert(key: String, suffix: String, stamp: Long, value: T): Unit =
    op.write(StreamElement.upsert(entityName, key, attr(suffix),
      java.util.UUID.randomUUID().toString, stamp, ser.serialize(value)))

  def delete(key: String, suffix: String, stamp: Long): Unit =
    op.write(StreamElement.delete(entityName, key, attr(suffix),
      java.util.UUID.randomUUID().toString, stamp))

  def deleteWildcard(key: String, stamp: Long): Unit =
    op.write(StreamElement.deleteWildcard(entityName, key, prefix,
      java.util.UUID.randomUUID().toString, stamp))

  def get(key: String, suffix: String, asOf: Long = Long.MaxValue): Option[T] =
    op.getRandomAccess(entityName, wildcardName).get(key, attr(suffix), asOf)
      .flatMap(e => ser.deserialize(e.value))

  /** All live (suffix, value) pairs of the key, suffix-ordered. */
  def list(key: String): Seq[(String, T)] =
    op.getRandomAccess(entityName, wildcardName).scanWildcard(key, prefix)
      .flatMap(e => ser.deserialize(e.value)
        .map(v => (e.attribute.stripPrefix(prefix), v)))
}
