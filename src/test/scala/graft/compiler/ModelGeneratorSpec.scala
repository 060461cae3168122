package graft.compiler

import graft.SparkSpec
import graft.core.{GraftOperator, Repository}

/** CompilerTest-shaped spec (reference: direct/core-testing/.../CompilerTest.java,
  * compiler/lib/.../ModelGeneratorTest.java): generate the typed model
  * source from a config, COMPILE it in this JVM, and exercise generated
  * accessors end-to-end against a live operator — including the negative
  * proof that the typing is real (a wrong-typed upsert fails to compile).
  */
class ModelGeneratorSpec extends SparkSpec {

  private val config =
    """entities {
      |  gateway {
      |    attributes {
      |      "status"   { scheme: string }
      |      "hits"     { scheme: long }
      |      "device.*" { scheme: bytes }
      |    }
      |  }
      |}
      |attributeFamilies {
      |  gw-model { entity: gateway, attributes: [ "*" ],
      |             storage: "inmem://model-test", type: primary,
      |             access: [ commit-log, batch-updates, batch-snapshot, random-access ] }
      |}""".stripMargin

  test("generated source shape: typed vals per attribute, package header") {
    val repo = Repository.parse(config)
    val src = ModelGenerator.generate(repo, "TestModel", pkg = "com.example.model")
    assert(src.startsWith("package com.example.model"))
    assert(src.contains("val `status`: graft.compiler.TypedAttribute[String]"))
    assert(src.contains("val `hits`: graft.compiler.TypedAttribute[Long]"))
    assert(src.contains(
      "val `device`: graft.compiler.TypedWildcardAttribute[Array[Byte]]"))
    assert(src.contains("val descriptor: graft.core.EntityDescriptor"))
  }

  test("compiled model: typed get/upsert/delete round-trip through a live operator") {
    val repo = Repository.parse(config)
    val op = new GraftOperator(spark, repo)
    import scala.reflect.runtime.{universe => ru}
    import scala.tools.reflect.ToolBox
    val tb = ru.runtimeMirror(getClass.getClassLoader).mkToolBox()
    val src = ModelGenerator.generate(repo, "TestModel")
    // the exercised accessors are STATICALLY typed in the compiled script:
    // upsert takes String for status, Long for hits, bytes for device.*
    val script =
      s"""$src
         |(op: graft.core.GraftOperator) => {
         |  val m = new TestModel(op)
         |  m.`gateway`.`status`.upsert("g1", 1L, "on")
         |  m.`gateway`.`hits`.upsert("g1", 2L, 42L)
         |  m.`gateway`.`device`.upsert("g1", "a", 3L, Array[Byte](1, 2))
         |  m.`gateway`.`device`.upsert("g1", "b", 4L, Array[Byte](3))
         |  m.`gateway`.`device`.delete("g1", "a", 5L)
         |  (m.`gateway`.`status`.get("g1"), m.`gateway`.`hits`.get("g1"),
         |   m.`gateway`.`device`.list("g1").map(_._1),
         |   m.`gateway`.`status`.descriptor.scheme)
         |}
         |""".stripMargin
    val fn = tb.eval(tb.parse(script))
      .asInstanceOf[GraftOperator => (Option[String], Option[Long], Seq[String], String)]
    val (status, hits, deviceSuffixes, scheme) = fn(op)
    assert(status == Some("on"))
    assert(hits == Some(42L))
    assert(deviceSuffixes == Seq("b"), "deleted suffix must not be listed")
    assert(scheme == "string")
  }

  test("the typing is compile-time: wrong-typed upsert is rejected by the compiler") {
    val repo = Repository.parse(config)
    import scala.reflect.runtime.{universe => ru}
    import scala.tools.reflect.ToolBox
    import scala.tools.reflect.ToolBoxError
    val tb = ru.runtimeMirror(getClass.getClassLoader).mkToolBox()
    val src = ModelGenerator.generate(repo, "TestModel")
    val bad =
      s"""$src
         |(op: graft.core.GraftOperator) => {
         |  val m = new TestModel(op)
         |  m.`gateway`.`status`.upsert("g1", 1L, 42)  // Int into a string attribute
         |}
         |""".stripMargin
    intercept[ToolBoxError] { tb.eval(tb.parse(bad)) }
  }

  test("ModelGenerator.compile convenience constructs a live model") {
    val repo = Repository.parse(
      config.replace("inmem://model-test", "inmem://model-test2"))
    val op = new GraftOperator(spark, repo)
    val model = ModelGenerator.compile(repo, "TestModel", op)
    // the toolbox wraps the class in a synthetic scope, so the runtime
    // name carries a suffix — TestModel$1
    assert(model != null && model.getClass.getSimpleName.startsWith("TestModel"))
  }

  test("identifier mangling: camel case, keyword/digit safety") {
    assert(ModelGenerator.ident("device.*") == "`device`")
    assert(ModelGenerator.ident("my-attr.name") == "`myAttrName`")
    assert(ModelGenerator.ident("type") == "`type`")
  }

  test("collision disambiguation survives a literal attribute taking the suffixed name") {
    // "my-attr" and "myAttr" both mangle to myAttr; the numeric-suffix
    // fallback picks myAttr2 — which the literal attribute "myAttr2"
    // already owns, so the suffix must keep bumping until unused and the
    // emitted source must still COMPILE (three distinct vals)
    val repo = Repository.parse(
      """entities { clash { attributes {
        |  "my-attr"  { scheme: string }
        |  "myAttr"   { scheme: string }
        |  "myAttr2"  { scheme: string }
        |} } }
        |attributeFamilies {
        |  clash-f { entity: clash, attributes: [ "*" ],
        |            storage: "inmem://model-clash", type: primary,
        |            access: [ commit-log, batch-updates, random-access ] }
        |}""".stripMargin)
    val src = ModelGenerator.generate(repo, "ClashModel")
    val valNames = "val `([^`]+)`".r.findAllMatchIn(src).map(_.group(1)).toSeq
      .filterNot(_ == "descriptor")
    assert(valNames.distinct.size == 3,
      s"three attributes need three distinct identifiers, got $valNames")
    // binding must be FAITHFUL, not merely compilable: each literal name
    // owns its own identifier (model.myAttr2 reads attribute "myAttr2",
    // never the mangled "my-attr"), and the mangled attribute takes a
    // suffix past every literal
    def boundAttr(valName: String): String = {
      val m = ("(?s)val `" + valName + "`[^\\n]*\\n[^\\n]*\\n[^\\n]*").r
        .findFirstIn(src).getOrElse(fail(s"no accessor for $valName"))
      // accessor args are (operator, "entity", "attribute", serializer)
      "\"clash\", \"([^\"]+)\"".r.findFirstMatchIn(m)
        .getOrElse(fail(s"no attribute arg in: $m")).group(1)
    }
    assert(boundAttr("myAttr") == "myAttr")
    assert(boundAttr("myAttr2") == "myAttr2",
      "literal myAttr2 must bind to its own attribute, not the mangled my-attr")
    assert(boundAttr("myAttr3") == "my-attr",
      "the mangled name takes the next free suffix")
    // the real proof: the toolbox compiles it
    val op = new GraftOperator(spark, repo)
    val model = ModelGenerator.compile(repo, "ClashModel", op)
    assert(model != null)
  }

  test("reserved members and colliding entity names disambiguate") {
    // an attribute literally named "descriptor" must not duplicate the
    // emitted `val descriptor: EntityDescriptor`; entity names mangling
    // to one identifier ("my-entity" vs "myEntity") must not emit two
    // `object myEntity`; an entity named "operator" must not shadow the
    // constructor param
    val repo = Repository.parse(
      """entities {
        |  "my-entity" { attributes { a { scheme: string } } }
        |  "myEntity"  { attributes { descriptor { scheme: string } } }
        |  "operator"  { attributes { b { scheme: string } } }
        |}
        |attributeFamilies {
        |  f1 { entity: "my-entity", attributes: [ "*" ],
        |       storage: "inmem://model-res1", type: primary,
        |       access: [ commit-log, batch-updates, random-access ] }
        |  f2 { entity: "myEntity", attributes: [ "*" ],
        |       storage: "inmem://model-res2", type: primary,
        |       access: [ commit-log, batch-updates, random-access ] }
        |  f3 { entity: "operator", attributes: [ "*" ],
        |       storage: "inmem://model-res3", type: primary,
        |       access: [ commit-log, batch-updates, random-access ] }
        |}""".stripMargin)
    val src = ModelGenerator.generate(repo, "ReservedModel")
    val objNames = "object `?([A-Za-z0-9]+)`?".r
      .findAllMatchIn(src).map(_.group(1)).toSeq
    assert(objNames.distinct.size == objNames.size, objNames.toString)
    assert(!objNames.contains("operator"), objNames.toString)
    // the attribute named "descriptor" binds under a suffixed identifier
    assert(src.contains("`descriptor2`"), src)
    // the real proof: the toolbox compiles it
    val op = new GraftOperator(spark, repo)
    assert(ModelGenerator.compile(repo, "ReservedModel", op) != null)
  }

  test("complex schemes stay byte-typed through the RAW codec, not a bad cast") {
    // the avro serializer is ValueSerializer[GenericRecord]; the generated
    // byte-typed surface must use BytesSerializer, or upsert/get would
    // ClassCastException at runtime
    val repo = Repository.parse(
      """entities { ev { attributes {
        |  "payload" { scheme: "avro:{\"type\":\"record\",\"name\":\"P\",\"fields\":[{\"name\":\"id\",\"type\":\"long\"}]}" }
        |} } }
        |attributeFamilies {
        |  ev-p { entity: ev, attributes: [ "*" ], storage: "inmem://model-avro",
        |         type: primary, access: [ commit-log, batch-updates, random-access ] }
        |}""".stripMargin)
    val src = ModelGenerator.generate(repo, "AvroModel")
    assert(src.contains("TypedAttribute[Array[Byte]]"))
    assert(src.contains("ValueSerializer.BytesSerializer"))
    assert(!src.contains("ValueSerializer.of(\"avro:"))
    // and the raw surface actually round-trips through a live operator
    val op = new GraftOperator(spark, repo)
    val model = ModelGenerator.compile(repo, "AvroModel", op)
    import scala.reflect.runtime.{universe => ru}
    import scala.tools.reflect.ToolBox
    val tb = ru.runtimeMirror(getClass.getClassLoader).mkToolBox()
    val fn = tb.eval(tb.parse(
      s"""${ModelGenerator.generate(repo, "AvroModel2")}
         |(op: graft.core.GraftOperator) => {
         |  val m = new AvroModel2(op)
         |  m.`ev`.`payload`.upsert("k", 1L, Array[Byte](7, 8))
         |  m.`ev`.`payload`.get("k").map(_.toSeq)
         |}
         |""".stripMargin))
      .asInstanceOf[GraftOperator => Option[Seq[Byte]]]
    assert(fn(op) == Some(Seq[Byte](7, 8)))
    assert(model != null)
  }

  test("colliding mangled attribute names disambiguate with a suffix") {
    val repo = Repository.parse(
      """entities { e { attributes {
        |  "my-attr" { scheme: string }
        |  "myAttr"  { scheme: string }
        |} } }""".stripMargin)
    val src = ModelGenerator.generate(repo, "CollideModel")
    // "my-attr" sorts before "myAttr": first keeps the base name, the
    // second gets the suffix — and the source must COMPILE
    assert(src.contains("val `myAttr`:") && src.contains("val `myAttr2`:"), src)
    import scala.reflect.runtime.{universe => ru}
    import scala.tools.reflect.ToolBox
    val tb = ru.runtimeMirror(getClass.getClassLoader).mkToolBox()
    tb.compile(tb.parse(src + "\n()"))
  }
}
