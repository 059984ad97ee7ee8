package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.ingest.{Transform, WikidataSource}

/** Property tests over generated entities (SURVEY §5): the structural
  * invariants of the normalize transform hold for ARBITRARY dumps,
  * not just the fixtures. */
object TransformProps extends Properties("Transform") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- generators ------------------------------------------------ //

  private val word = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))

  private case class GenSnak(pid: Int, payload: String)
  private case class GenStmt(main: GenSnak, qualifiers: List[GenSnak])
  private case class GenEntity(prefix: String, num: Long, lang: String,
                               label: String, stmts: List[GenStmt])

  private val snakGen: Gen[GenSnak] = for {
    pid <- Gen.choose(1, 9999)
    kind <- Gen.oneOf("quantity", "string", "item")
    amt <- Gen.choose(-1000, 1000)
    s <- word
    q <- Gen.choose(1L, 999999L)
  } yield {
    val payload = kind match {
      case "quantity" =>
        s""""datavalue":{"value":{"amount":"${if (amt >= 0) "+" else ""}$amt","unit":"1"},"type":"quantity"},"datatype":"quantity""""
      case "string" =>
        s""""datavalue":{"value":"$s","type":"string"},"datatype":"string""""
      case _ =>
        s""""datavalue":{"value":{"entity-type":"item","numeric-id":$q,"id":"Q$q"},"type":"wikibase-entityid"},"datatype":"wikibase-item""""
    }
    GenSnak(pid, payload)
  }

  private val stmtGen: Gen[GenStmt] = for {
    main <- snakGen
    quals <- Gen.listOfN(2, snakGen).flatMap(l =>
      Gen.choose(0, 2).map(l.take))
  } yield GenStmt(main, quals)

  private val entityGen: Gen[GenEntity] = for {
    prefix <- Gen.oneOf("Q", "P", "L")
    num <- Gen.choose(1L, 100000000L)
    lang <- Gen.oneOf("en", "de", "xx")
    label <- word
    stmts <- Gen.listOfN(4, stmtGen).flatMap(l =>
      Gen.choose(0, 4).map(l.take))
  } yield GenEntity(prefix, num, lang, label, stmts)

  private def render(e: GenEntity): String = {
    def snakJson(s: GenSnak) =
      s"""{"snaktype":"value","property":"P${s.pid}",${s.payload}}"""
    val claims = e.stmts.zipWithIndex.map { case (st, i) =>
      val quals =
        if (st.qualifiers.isEmpty) ""
        else st.qualifiers.zipWithIndex.map { case (q, j) =>
          s""""P${9000 + j}":[${snakJson(q)}]"""
        }.mkString(""","qualifiers":{""", ",", "}")
      s""""P${100 + i}":[{"mainsnak":${snakJson(st.main)},"type":"statement"$quals,"rank":"normal"}]"""
    }.mkString(",")
    val tpe = e.prefix match {
      case "Q" => "item"; case "P" => "property"; case _ => "lexeme"
    }
    s"""{"type":"$tpe","id":"${e.prefix}${e.num}","labels":{"${e.lang}":{"language":"${e.lang}","value":"${e.label}"}},"claims":{$claims}}"""
  }

  private def normalize(entities: List[GenEntity]) = {
    import spark.implicits._
    val lines = spark.createDataset(entities.map(render)).toDF("value")
    Transform.normalize(
      WikidataSource.entities(WikidataSource.fromLines(lines)), "en")
  }

  private val batchGen = Gen.listOfN(10, entityGen)
    .suchThat(l => l.map(e => (e.prefix, e.num)).distinct.size == l.size)

  // ---- properties ------------------------------------------------ //

  property("claims count = Σ(1 + |qualifiers|) per entity") =
    forAllNoShrink(batchGen) { entities =>
      val got = normalize(entities)
        .select(col("id.tb"), col("id.id"), size(col("claims_arr")))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      entities.forall { e =>
        val tb = e.prefix match {
          case "Q" => "Entity"; case "P" => "Property"; case _ => "Lexeme"
        }
        got((tb, e.num)) == e.stmts.map(1 + _.qualifiers.size).sum
      }
    }

  property("ID routing: Q→Entity, P→Property, L→Lexeme; ids preserved") =
    forAllNoShrink(batchGen) { entities =>
      val got = normalize(entities)
        .select(col("id.tb"), col("id.id")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      got == entities.map { e =>
        val tb = e.prefix match {
          case "Q" => "Entity"; case "P" => "Property"; case _ => "Lexeme"
        }
        (tb, e.num)
      }.toSet
    }

  property("label = WIKIDATA_LANG translation or empty string") =
    forAllNoShrink(batchGen) { entities =>
      val got = normalize(entities)
        .select(col("id.id"), col("label")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      entities.forall { e =>
        got(e.num) == (if (e.lang == "en") e.label else "")
      }
    }

  property("qualifier claims tagged tb=Claims, main claims tb=Property") =
    forAllNoShrink(batchGen) { entities =>
      val got = normalize(entities)
        .select(col("id.id"),
          expr("size(filter(claims_arr, c -> c.id.tb = 'Property'))"),
          expr("size(filter(claims_arr, c -> c.id.tb = 'Claims'))"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      entities.forall { e =>
        got(e.num) == (e.stmts.size, e.stmts.map(_.qualifiers.size).sum)
      }
    }

  property("Porter2: alpha in → nonempty alpha out, bounded growth") =
    forAllNoShrink(word) { w =>
      val s = graft.functions.Porter2.stem(w)
      s.nonEmpty && s.forall(_.isLetter) && s.length <= w.length + 1
    }
}
