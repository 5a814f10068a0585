package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{LangIdExpressions, LangProfiles}

/** Held-out accuracy + contract tests for the trigram language ID.
  * Sentences below share NO full sentence with the embedded seeds —
  * they test trigram generalization, not memorization.
  */
class LangIdSpec extends AnyFunSuite {

  private val heldOut: Seq[(String, String)] = Seq(
    "en" -> "She opened the window because the morning light was beautiful.",
    "en" -> "Nobody knew why the old clock stopped working last winter.",
    "en" -> "The children walked slowly along the river after school.",
    "fr" -> "Elle a ouvert la fenêtre parce que la lumière du matin était belle.",
    "fr" -> "Personne ne savait pourquoi la vieille horloge s'était arrêtée.",
    "fr" -> "Les enfants marchaient lentement le long de la rivière après l'école.",
    "de" -> "Sie öffnete das Fenster, weil das Morgenlicht so schön war.",
    "de" -> "Niemand wusste, warum die alte Uhr letzten Winter stehen blieb.",
    "de" -> "Die Kinder gingen nach der Schule langsam am Fluss entlang.",
    "es" -> "Ella abrió la ventana porque la luz de la mañana era hermosa.",
    "es" -> "Nadie sabía por qué el viejo reloj dejó de funcionar el invierno pasado.",
    "es" -> "Los niños caminaban despacio junto al río después de la escuela.",
    "it" -> "Ha aperto la finestra perché la luce del mattino era bellissima.",
    "it" -> "Nessuno sapeva perché il vecchio orologio si fosse fermato in inverno.",
    "it" -> "I bambini camminavano lentamente lungo il fiume dopo la scuola.",
    "pt" -> "Ela abriu a janela porque a luz da manhã estava bonita.",
    "pt" -> "Ninguém sabia por que o velho relógio parou de funcionar no inverno.",
    "pt" -> "As crianças caminhavam devagar ao longo do rio depois da escola."
  )

  test("held-out sentences classify to the right language") {
    val wrong = heldOut.collect {
      case (lang, s) if LangProfiles.classify(s) != lang =>
        s"$lang: '$s' -> ${LangProfiles.classify(s)}"
    }
    assert(wrong.isEmpty, s"misclassified:\n${wrong.mkString("\n")}")
  }

  test("no letters -> und; classification is deterministic") {
    assert(LangProfiles.classify("") == "und")
    assert(LangProfiles.classify("   \t\n") == "und")
    assert(LangProfiles.classify("12345 !!! ???") == "und")
    val s = heldOut.head._2
    assert(LangProfiles.classify(s) == LangProfiles.classify(s))
  }

  test("normalize collapses non-letters and preserves accents") {
    assert(LangProfiles.normalize("Héllo,  Wörld!42") == " héllo wörld ")
    assert(LangProfiles.normalize("") == " ")
  }

  test("expression form matches driver-side classify, nulls propagate") {
    val spark = TestSpark.spark
    import spark.implicits._
    LangIdExpressions.register(spark)
    val df = Seq(
      Some("The weather was fine and the road was long."),
      Some("Die Katze schläft gern in der warmen Küche."),
      None
    ).toDF("text")
    val got = df
      .select(LangIdExpressions.langIdNgram($"text").as("lang"))
      .collect()
      .map(r => Option(r.getString(0)))
    assert(got(0).contains(
      LangProfiles.classify("The weather was fine and the road was long.")))
    assert(got(1).contains(
      LangProfiles.classify("Die Katze schläft gern in der warmen Küche.")))
    assert(got(0).contains("en") && got(1).contains("de"))
    assert(got(2).isEmpty)
  }
}
