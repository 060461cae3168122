package graft.compiler

import graft.core.{AttributeDescriptor, Repository, ValueSerializer}

/** Generates Scala source for a typed model of a repository config — one
  * nested object per entity, one typed accessor val per attribute, with
  * scheme-derived value types (reference: compiler/lib/.../ModelGenerator.java
  * + the freemarker template; test shape direct/core-testing/.../CompilerTest.java).
  *
  * The reference generates Java via freemarker at build time (a maven
  * plugin); here generation is a pure `Repository => String` so a build can
  * write the file wherever it wants, and specs compile the output with the
  * in-JVM toolbox — compile-time typed access is the contract either way:
  * `model.gateway.status.upsert(key, stamp, value)` only compiles when
  * `value` matches the attribute's scheme type.
  */
object ModelGenerator {

  /** Scala type rendered for a scheme; complex schemes (avro/proto/
    * registry) stay byte-typed at the model surface — their structured
    * decoding is the serializer registry's job, and a generated model
    * must not hard-code a schema that the registry may evolve.
    */
  def scalaType(scheme: String): String = scheme.takeWhile(_ != ':') match {
    case "string" | "json" => "String"
    case "long"            => "Long"
    case "integer"         => "Int"
    case "double"          => "Double"
    case "float"           => "Float"
    case _                 => "Array[Byte]"
  }

  /** camelCase identifier from an entity/attribute name, backticked so
    * reserved words and leading digits stay legal (reference CamelCase
    * util, core/.../util/CamelCase.java).
    */
  def ident(name: String): String = {
    val parts = name.split("[^A-Za-z0-9]+").filter(_.nonEmpty)
    val camel =
      if (parts.isEmpty) "attr"
      else (parts.head +: parts.tail.map(_.capitalize)).mkString
    "`" + camel + "`"
  }

  /** Schemes whose serializer's Scala type IS the rendered type; complex
    * schemes (avro/proto/registry) resolve to STRUCTURED serializers
    * (GenericRecord etc.), so their byte-typed model surface must use the
    * raw-bytes codec — casting the structured serializer to
    * `ValueSerializer[Array[Byte]]` would ClassCastException at runtime.
    */
  private val PrimitiveSchemes =
    Set("bytes", "string", "json", "long", "integer", "double", "float")

  private def accessor(entity: String, a: AttributeDescriptor,
      name: String): String = {
    val tpe = scalaType(a.scheme)
    val base = a.scheme.takeWhile(_ != ':')
    val ser =
      if (PrimitiveSchemes(base))
        "graft.core.ValueSerializer.of(" + quote(a.scheme) +
          s").asInstanceOf[graft.core.ValueSerializer[$tpe]]"
      else "graft.core.ValueSerializer.BytesSerializer"
    if (a.isWildcard)
      s"""    val $name: graft.compiler.TypedWildcardAttribute[$tpe] =
         |      new graft.compiler.TypedWildcardAttribute[$tpe](operator,
         |        ${quote(entity)}, ${quote(a.prefix)}, $ser)""".stripMargin
    else
      s"""    val $name: graft.compiler.TypedAttribute[$tpe] =
         |      new graft.compiler.TypedAttribute[$tpe](operator,
         |        ${quote(entity)}, ${quote(a.name)}, $ser)""".stripMargin
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c    => c.toString
    } + "\""

  /** Emit the model source. `pkg` empty → no package header (the form the
    * in-JVM toolbox can compile; a build writing files passes a package).
    */
  def generate(repo: Repository, className: String, pkg: String = ""): String = {
    val header =
      if (pkg.isEmpty) "" else s"package $pkg\n\n"
    def bare(s: String) = s.stripPrefix("`").stripSuffix("`")
    // distinct names can mangle to one identifier ("my-entity" and
    // "myEntity" both camel to myEntity; same for attributes) —
    // disambiguate with a numeric suffix. Binding must stay FAITHFUL,
    // not merely compilable: a name that IS already a legal identifier
    // (mangling changed nothing) owns that identifier outright, reserved
    // in a first pass — otherwise "my-attr" could take `myAttr2` and
    // silently shadow the literal attribute "myAttr2". Members the model
    // itself emits (`operator` on the class, `descriptor` per entity
    // object) are seeded as reserved, so a config naming an attribute
    // literally "descriptor" gets `descriptor2` instead of a
    // duplicate-definition compile error.
    def assign(names: Seq[String], reserved: Set[String]): Seq[String] = {
      val used = scala.collection.mutable.Set.empty[String] ++ reserved
      names.foreach { raw =>
        val b = bare(ident(raw))
        if (b == raw && !reserved.contains(b)) used += b
      }
      val assigned = scala.collection.mutable.Set.empty[String] ++ reserved
      names.map { raw =>
        val base = ident(raw)
        var name = base
        if (bare(base) != raw || reserved.contains(bare(base)) ||
            assigned.contains(bare(base))) {
          var n = 1
          while (used.contains(bare(name)) || assigned.contains(bare(name))) {
            n += 1
            name = "`" + bare(base) + n + "`"
          }
        }
        assigned += bare(name)
        name
      }
    }
    val sortedEntities = repo.entities.values.toSeq.sortBy(_.name)
    val entityNames = assign(sortedEntities.map(_.name), Set("operator"))
    val entities = sortedEntities.zip(entityNames).map { case (e, eName) =>
      def rawOf(a: graft.core.AttributeDescriptor) = if (a.isWildcard) a.prefix else a.name
      val sorted = e.attributes.sortBy(_.name)
      val attrNames = assign(sorted.map(rawOf), Set("descriptor"))
      val attrs = sorted.zip(attrNames)
        .map { case (a, name) => accessor(e.name, a, name) }
        .mkString("\n")
      s"""  object $eName {
         |    val descriptor: graft.core.EntityDescriptor =
         |      operator.repo.entity(${quote(e.name)})
         |$attrs
         |  }""".stripMargin
    }.mkString("\n")
    s"""${header}/** Generated by graft.compiler.ModelGenerator — do not edit. */
       |final class $className(val operator: graft.core.GraftOperator)
       |    extends Serializable {
       |$entities
       |}""".stripMargin
  }

  /** Compile the generated model in this JVM and construct it — the
    * spec/REPL path (a build would write [[generate]]'s output to a file
    * and let scalac compile it with the project).
    */
  def compile(repo: Repository, className: String,
      op: graft.core.GraftOperator): Any = {
    import scala.reflect.runtime.{universe => ru}
    import scala.tools.reflect.ToolBox
    val tb = ru.runtimeMirror(getClass.getClassLoader).mkToolBox()
    val src = generate(repo, className)
    val script =
      s"""$src
         |(op: graft.core.GraftOperator) => new $className(op)
         |""".stripMargin
    tb.eval(tb.parse(script))
      .asInstanceOf[graft.core.GraftOperator => Any](op)
  }
}
