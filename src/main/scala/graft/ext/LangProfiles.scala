package graft.ext

/** Character-trigram language profiles (Cavnar–Trenkle style): per
  * language, the top-`TopK` most frequent trigrams of an embedded seed
  * text, rank-weighted (top trigram weights N, next N−1, …). A document
  * is scored per language by summing the weights of every trigram
  * OCCURRENCE in its normalized text; argmax (alphabetical tie-break)
  * is the prediction. Profiles are tiny (≤ 200 trigrams/language) and
  * deterministic — they bake into the plan as literals/reference
  * objects, so language ID stays a narrow per-row pass with no shuffle
  * (replacing the earlier 4-word-dictionary toy at the same plan
  * shape).
  *
  * Normalization is byte-for-byte identical in both engines:
  * `' ' || regexp_replace(lower(text), '[^a-z]+', ' ') || ' '` — ASCII
  * letters only (seed texts are pre-transliterated to ASCII), so JVM
  * and DuckDB lowercase/regex semantics agree exactly.
  */
object LangProfiles {

  val TopK = 200

  /** Seed corpora: short original texts, one per language, ASCII-only
    * (accents/umlauts transliterated) so the a–z normalization keeps
    * every character class identical across engines.
    */
  val seedTexts: Seq[(String, String)] = Seq(
    "de" -> ("der schnelle braune fuchs springt ueber den faulen hund. " +
      "das ist ein kurzer text ueber das wetter und die menschen die in " +
      "der stadt wohnen. wir gehen am morgen auf den markt und dann " +
      "trinken wir tee mit unseren freunden. es gibt nichts besseres als " +
      "ein gutes buch und ein warmes feuer im winter. die kinder spielen " +
      "im garten waehrend ihre eltern ihnen vom haus aus zusehen. heute " +
      "scheint die sonne und der himmel ist blau ueber den bergen."),
    "en" -> ("the quick brown fox jumps over the lazy dog. this is a " +
      "short text about the weather and the people who live in the " +
      "city. we are going to the market in the morning and then we will " +
      "have some tea with our friends. there is nothing better than a " +
      "good book and a warm fire in the winter. the children play in " +
      "the garden while their parents watch them from the house. today " +
      "the sun is shining and the sky is blue over the mountains."),
    "es" -> ("el rapido zorro marron salta sobre el perro perezoso. este " +
      "es un texto corto sobre el tiempo y la gente que vive en la " +
      "ciudad. vamos al mercado por la manana y despues tomaremos te " +
      "con nuestros amigos. no hay nada mejor que un buen libro y un " +
      "fuego caliente en el invierno. los ninos juegan en el jardin " +
      "mientras sus padres los miran desde la casa. hoy brilla el sol y " +
      "el cielo esta azul sobre las montanas."),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux. " +
      "ceci est un petit texte sur le temps et les gens qui vivent dans " +
      "la ville. nous allons au marche le matin et ensuite nous " +
      "prendrons du the avec nos amis. il n y a rien de mieux qu un bon " +
      "livre et un feu chaud en hiver. les enfants jouent dans le " +
      "jardin pendant que leurs parents les regardent depuis la maison. " +
      "aujourd hui le soleil brille et le ciel est bleu sur les " +
      "montagnes."),
    "it" -> ("la rapida volpe marrone salta sopra il cane pigro. questo " +
      "e un breve testo sul tempo e sulla gente che vive nella citta. " +
      "andiamo al mercato la mattina e poi prenderemo il te con i " +
      "nostri amici. non c e niente di meglio di un buon libro e di un " +
      "fuoco caldo in inverno. i bambini giocano nel giardino mentre i " +
      "loro genitori li guardano dalla casa. oggi il sole splende e il " +
      "cielo e azzurro sopra le montagne."),
    "pt" -> ("a rapida raposa marrom salta sobre o cao preguicoso. este " +
      "e um texto curto sobre o tempo e as pessoas que vivem na cidade. " +
      "vamos ao mercado de manha e depois tomaremos cha com os nossos " +
      "amigos. nao ha nada melhor do que um bom livro e um fogo quente " +
      "no inverno. as criancas brincam no jardim enquanto os seus pais " +
      "as observam da casa. hoje o sol brilha e o ceu esta azul sobre " +
      "as montanhas."),
    "nl" -> ("de snelle bruine vos springt over de luie hond. dit is een " +
      "korte tekst over het weer en de mensen die in de stad wonen. we " +
      "gaan morgen naar de markt en daarna drinken we thee met onze " +
      "vrienden. er is niets beters dan een goed boek en een warm vuur " +
      "in de winter. de kinderen spelen in de tuin terwijl hun ouders " +
      "vanuit het huis toekijken. vandaag schijnt de zon en de lucht is " +
      "blauw boven de bergen."),
    "sv" -> ("den snabba bruna raven hoppar over den lata hunden. detta " +
      "ar en kort text om vadret och manniskorna som bor i staden. vi " +
      "gar till marknaden pa morgonen och sedan dricker vi te med vara " +
      "vanner. det finns inget battre an en bra bok och en varm eld pa " +
      "vintern. barnen leker i tradgarden medan deras foraldrar tittar " +
      "pa fran huset. idag skiner solen och himlen ar bla over bergen."),
    "da" -> ("den hurtige brune raev springer over den dovne hund. dette " +
      "er en kort tekst om vejret og de mennesker der bor i byen. vi " +
      "gar pa markedet om morgenen og bagefter drikker vi te med vores " +
      "venner. der findes ikke noget bedre end en god bog og en varm " +
      "ild om vinteren. bornene leger i haven mens deres foraeldre ser " +
      "til fra huset. i dag skinner solen og himlen er bla over bjergene."),
    "pl" -> ("szybki brazowy lis skacze nad leniwym psem. to jest " +
      "krotki tekst o pogodzie i ludziach ktorzy mieszkaja w miescie. " +
      "rano idziemy na targ a potem pijemy herbate z naszymi " +
      "przyjaciolmi. nie ma nic lepszego niz dobra ksiazka i cieple " +
      "ognisko zima. dzieci bawia sie w ogrodzie podczas gdy rodzice " +
      "patrza na nie z domu. dzisiaj swieci slonce a niebo nad gorami " +
      "jest niebieskie."),
    "ro" -> ("vulpea maro si rapida sare peste cainele lenes. acesta " +
      "este un text scurt despre vreme si despre oamenii care traiesc " +
      "in oras. mergem dimineata la piata si apoi bem ceai cu " +
      "prietenii nostri. nu exista nimic mai bun decat o carte buna " +
      "si un foc cald iarna. copiii se joaca in gradina in timp ce " +
      "parintii lor ii privesc din casa. astazi soarele straluceste " +
      "si cerul este albastru deasupra muntilor."),
    "fi" -> ("nopea ruskea kettu hyppaa laiskan koiran yli. tama on " +
      "lyhyt teksti saasta ja ihmisista jotka asuvat kaupungissa. " +
      "menemme aamulla torille ja sitten juomme teeta ystaviemme " +
      "kanssa. ei ole mitaan parempaa kuin hyva kirja ja lammin tuli " +
      "talvella. lapset leikkivat puutarhassa kun heidan vanhempansa " +
      "katsovat talosta. tanaan aurinko paistaa ja taivas on sininen " +
      "vuorten ylla."))

  /** Language codes, ascending — the tie-break order and the index
    * order of every per-language score array.
    */
  val langs: Seq[String] = seedTexts.map(_._1).sorted

  /** The exact normalization both engines apply before trigrams. */
  def normalize(s: String): String =
    " " + s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z]+", " ") + " "

  private def trigramCounts(text: String): Map[String, Long] = {
    val s = normalize(text)
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i + 3 <= s.length) {
      val tg = s.substring(i, i + 3)
      m.update(tg, m.getOrElse(tg, 0L) + 1L)
      i += 1
    }
    m.toMap
  }

  /** Rank-weighted profile of one seed text: top `TopK` trigrams by
    * (count desc, trigram asc), weight = N − rank (top gets N).
    */
  def profileOf(text: String): Seq[(String, Long)] = {
    val top = trigramCounts(text).toSeq
      .sortBy { case (tg, n) => (-n, tg) }
      .take(TopK)
    val n = top.size
    top.zipWithIndex.map { case ((tg, _), i) => (tg, (n - i).toLong) }
  }

  /** lang -> (trigram -> weight), aligned with [[langs]]. */
  val profiles: Map[String, Map[String, Long]] =
    seedTexts.map { case (l, t) => l -> profileOf(t).toMap }.toMap

  /** Weight vectors per trigram (index-aligned with [[langs]]) — the
    * lookup shape the scoring kernel wants.
    */
  lazy val trigramWeights: Map[String, Array[Long]] = {
    val keys = profiles.values.flatMap(_.keys).toSet
    keys.map { tg =>
      tg -> langs.map(l => profiles(l).getOrElse(tg, 0L)).toArray
    }.toMap
  }
}
