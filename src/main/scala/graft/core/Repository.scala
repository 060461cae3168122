package graft.core

/** Entity / attribute-family schema registry, parsed from HOCON-style config.
  *
  * Mirrors the reference's config-driven repository
  * (reference: core/src/main/java/cz/o2/proxima/core/repository/Repository.java:88,
  * ConfigRepository.java:507 readEntityDescriptors, :1145 readAttributeFamilies,
  * :2003 readTransformations) on the same config shape
  * (core/src/test/resources/test-reference.conf). A tiny HOCON-subset parser
  * is embedded (no external deps are available in this build): nested objects,
  * `key: value`, quoted keys/strings, arrays, `#`/`//` comments.
  *
  * The repository is pure metadata — storage binding happens in
  * [[graft.sources]] where each family's storage URI is mapped to a Spark
  * reader/writer (parquet dir, in-memory fixture, rate source...).
  */
final case class AttributeDescriptor(
    entity: String,
    name: String,            // declared name, e.g. "status" or "device.*"
    scheme: String,
    proxy: Option[ProxySpec] = None) {
  def isProxy: Boolean = proxy.isDefined
  /** Wildcard attributes model map/list-like relations, suffix = map key
    * (reference AttributeDescriptor.isWildcard:135).
    */
  def isWildcard: Boolean = name.endsWith(".*")
  /** "device." for "device.*", else the full name. */
  def prefix: String = if (isWildcard) name.dropRight(1) else name
  def serializer: ValueSerializer[_] = ValueSerializer.of(scheme)
  /** True iff a concrete attribute name (e.g. "device.abc") belongs here. */
  def matches(attrName: String): Boolean =
    if (isWildcard) attrName.startsWith(prefix) && attrName.length > prefix.length
    else attrName == name
}

final case class EntityDescriptor(
    name: String,
    attributes: Seq[AttributeDescriptor]) {
  private val byName = attributes.map(a => a.name -> a).toMap
  def attribute(name: String): Option[AttributeDescriptor] = byName.get(name)
  /** Resolve a concrete attribute name against scalar + wildcard declarations. */
  def resolve(attrName: String): Option[AttributeDescriptor] =
    byName.get(attrName).orElse(attributes.find(_.matches(attrName)))
}

/** Access capabilities of a family
  * (reference: core/.../storage/AccessType.java:51-59).
  */
object Access {
  val CommitLog = "commit-log"
  val BatchUpdates = "batch-updates"
  val BatchSnapshot = "batch-snapshot"
  val RandomAccess = "random-access"
  val CachedView = "cached-view"
  val StateCommitLog = "state-commit-log"
  val ListPrimaryKey = "list-primary-key"
  val ReadOnly = "read-only"
  val WriteOnly = "write-only"
}

final case class AttributeFamilyDescriptor(
    name: String,
    entity: String,
    attributes: Seq[String],   // declared names or "*"
    storageUri: String,
    familyType: String,        // primary | replica
    access: Set[String],
    // remaining scalar keys (e.g. `retention: 30d`,
    // `compact-target-mb: 128`) — declared maintenance policies and
    // binding tunables ride here, the reference's cfg-map pattern
    // (AttributeFamilyDescriptor cfg / ConfigRepository family options)
    options: Map[String, String] = Map.empty) {
  def canReadCommitLog: Boolean = access.contains(Access.CommitLog)
  def canReadBatchUpdates: Boolean = access.contains(Access.BatchUpdates)
  def canReadBatchSnapshot: Boolean = access.contains(Access.BatchSnapshot)
  def canRandomAccess: Boolean = access.contains(Access.RandomAccess)
  def coversAttribute(entityDesc: EntityDescriptor, attr: String): Boolean =
    attributes.contains("*") || attributes.exists { declared =>
      declared == attr ||
        entityDesc.attribute(declared).exists(_.matches(attr))
    }
}

/** Config-declared element-wise transformation feeding other attributes
  * (reference: core/.../transform/ElementWiseTransformation.java:29,
  * ConfigRepository.readTransformations:2003).
  */
final case class TransformationDescriptor(
    name: String,
    entity: String,
    attributes: Seq[String],
    transformClass: String)

final class Repository private (
    val entities: Map[String, EntityDescriptor],
    val families: Map[String, AttributeFamilyDescriptor],
    val transformations: Map[String, TransformationDescriptor]) {

  def entity(name: String): EntityDescriptor =
    entities.getOrElse(name, throw new IllegalArgumentException(s"No entity $name"))

  /** Access-path selection: pick a family able to serve `need` for an
    * attribute (reference BeamDataOperator.findSuitableAccessors:217 — the
    * reference's only "optimizer" is this routing).
    */
  def familyFor(entityName: String, attr: String, need: String): Option[AttributeFamilyDescriptor] = {
    val e = entity(entityName)
    families.values.filter(_.entity == entityName)
      .filter(_.access.contains(need))
      .find(_.coversAttribute(e, attr))
  }

  def familiesOf(entityName: String): Seq[AttributeFamilyDescriptor] =
    families.values.filter(_.entity == entityName).toSeq.sortBy(_.name)
}

object Repository {

  def parse(config: String): Repository = {
    val root = HoconLite.parse(config)
    val entities = HoconLite.obj(root.getOrElse("entities", Map.empty))
      .map { case (ename, body) =>
        // pass 1: declared scheme (None where omitted) + proxy block
        val parsed = HoconLite.obj(HoconLite.obj(body).getOrElse("attributes", Map.empty))
          .map { case (aname, abody) =>
            val m = HoconLite.obj(abody)
            val scheme = m.get("scheme").map(HoconLite.str)
            val proxy = m.get("proxy").map {
              case s: String =>
                // symmetric: `proxy: "_e.*"` (+ optional sibling `apply:`)
                val cls = m.get("apply").map(HoconLite.str)
                ProxySpec(Some(ProxySide(s, cls)), Some(ProxySide(s, cls)))
              case o =>
                val om = HoconLite.obj(o)
                ProxySpec(
                  read = om.get("read").map(HoconLite.obj).map(r =>
                    ProxySide(HoconLite.str(r("from")), r.get("apply").map(HoconLite.str))),
                  write = om.get("write").map(HoconLite.obj).map(w =>
                    ProxySide(HoconLite.str(w("into")), w.get("apply").map(HoconLite.str))))
            }
            (aname, scheme, proxy)
          }.toSeq
        val declaredScheme = parsed.map { case (n, s, _) => n -> s }.toMap
        // pass 2: a proxy without an explicit scheme inherits its READ
        // target's (reference: proxies take the proxied attribute's scheme;
        // write-only / different-read-scheme proxies declare their own —
        // test-reference.conf:77-103 schemeAsymmetric, writeAsymmetric)
        val attrs = parsed.map { case (aname, scheme, proxy) =>
          val resolved = scheme.orElse(
            proxy.flatMap(_.read).flatMap(r => declaredScheme.get(r.target).flatten))
            .getOrElse("bytes")
          AttributeDescriptor(ename, aname, resolved, proxy)
        }.sortBy(_.name)
        ename -> EntityDescriptor(ename, attrs)
      }
    val families = HoconLite.obj(root.getOrElse("attributeFamilies", Map.empty))
      .map { case (fname, body) =>
        val m = HoconLite.obj(body)
        val access = m.get("access") match {
          case Some(l: List[_]) => l.map(x => HoconLite.str(x)).toSet
          case Some(other)      => HoconLite.str(other).split(",").map(_.trim).toSet
          case None             => Set.empty[String]
        }
        fname -> AttributeFamilyDescriptor(
          name = fname,
          entity = m.get("entity").map(HoconLite.str).getOrElse(""),
          attributes = m.get("attributes") match {
            case Some(l: List[_]) => l.map(HoconLite.str)
            case Some(other)      => Seq(HoconLite.str(other))
            case None             => Seq("*")
          },
          storageUri = m.get("storage").map(HoconLite.str).getOrElse(""),
          familyType = m.get("type").map(HoconLite.str).getOrElse("primary"),
          access = access,
          options = m.view
            .filterKeys(k => !Set("entity", "attributes", "storage",
              "type", "access").contains(k))
            .collect { case (k, v) if !v.isInstanceOf[Map[_, _]] &&
              !v.isInstanceOf[List[_]] => k -> HoconLite.str(v) }
            .toMap)
      }
    val transformations = HoconLite.obj(root.getOrElse("transformations", Map.empty))
      .map { case (tname, body) =>
        val m = HoconLite.obj(body)
        tname -> TransformationDescriptor(
          name = tname,
          entity = m.get("entity").map(HoconLite.str).getOrElse(""),
          attributes = m.get("attributes") match {
            case Some(l: List[_]) => l.map(HoconLite.str)
            case Some(other)      => Seq(HoconLite.str(other))
            case None             => Seq.empty
          },
          transformClass = m.get("using").map(HoconLite.str).getOrElse(""))
      }
    new Repository(entities, families, transformations)
  }
}

/** Minimal HOCON-subset parser: objects `{}` (braces optional at root),
  * `key: value` / `key = value`, arrays `[a, b]`, quoted strings and keys,
  * `#` and `//` comments, trailing commas. Enough for the reference's config
  * shape; not a general HOCON implementation (no includes/substitutions).
  */
object HoconLite {
  /** End-of-input sentinel (kept as an escape so the source stays plain text). */
  private val Eof: Char = 0.toChar

  def obj(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case _            => Map.empty
  }
  def str(v: Any): String = v match {
    case s: String => s
    case other     => String.valueOf(other)
  }

  def parse(text: String): Map[String, Any] = {
    val p = new Parser(text)
    p.skipWs()
    val r = if (p.peek == '{') p.parseObject() else p.parseObjectBody(Eof)
    r
  }

  private final class Parser(s: String) {
    private var i = 0
    def peek: Char = if (i < s.length) s.charAt(i) else Eof
    private def next(): Char = { val c = peek; i += 1; c }

    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (i < s.length && (s.charAt(i).isWhitespace || s.charAt(i) == ',')) i += 1
        if (i < s.length && (s.charAt(i) == '#' ||
            (s.charAt(i) == '/' && i + 1 < s.length && s.charAt(i + 1) == '/'))) {
          while (i < s.length && s.charAt(i) != '\n') i += 1
        } else go = false
      }
    }

    def parseObject(): Map[String, Any] = {
      require(next() == '{'); val m = parseObjectBody('}'); require(next() == '}'); m
    }

    def parseObjectBody(end: Char): Map[String, Any] = {
      var m = Map.empty[String, Any]
      skipWs()
      while (peek != end && peek != Eof) {
        val key = parseKey()
        skipWs()
        val value =
          if (peek == '{') parseObject()           // `key { ... }` (no colon)
          else {
            require(peek == ':' || peek == '=', s"expected ':' at $i near ${s.slice(i, i + 20)}")
            next(); skipWs(); parseValue()
          }
        m += key -> value
        skipWs()
      }
      m
    }

    private def parseKey(): String = {
      skipWs()
      if (peek == '"') parseQuoted()
      else {
        val sb = new StringBuilder
        while (i < s.length && !":=,{}[]#\n\r\t ".contains(s.charAt(i))) sb += next()
        sb.result()
      }
    }

    private def parseQuoted(): String = {
      require(next() == '"')
      val sb = new StringBuilder
      while (peek != '"' && peek != Eof) {
        val c = next()
        if (c == '\\' && peek != Eof) sb += next() else sb += c
      }
      require(next() == '"')
      sb.result()
    }

    def parseValue(): Any = {
      skipWs()
      peek match {
        case '{' => parseObject()
        case '[' =>
          next()
          var l = List.empty[Any]
          skipWs()
          while (peek != ']' && peek != Eof) { l ::= parseValue(); skipWs() }
          require(next() == ']')
          l.reverse
        case '"' => parseQuoted()
        case _ =>
          val sb = new StringBuilder
          while (i < s.length && !",{}[]#\n\r".contains(s.charAt(i))) sb += next()
          val raw = sb.result().trim
          raw match {
            case "true"  => true
            case "false" => false
            case x if x.nonEmpty && x.forall(c => c.isDigit || c == '-') => x.toLong
            case x => x
          }
      }
    }
  }
}
