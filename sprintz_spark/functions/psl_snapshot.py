"""Static snapshot subset of the Mozilla Public Suffix List (PSL).

``registrable_host`` (functions/url.py) resolves eTLD+1 by longest-
suffix match against these rules. This is a SNAPSHOT SUBSET of the
public list at publicsuffix.org — the widely-used ccTLD second-level
registries (the ``.co.uk`` family that a bare "strip www." heuristic
gets wrong) plus the common three-label registries. A production
deployment swaps in the full ~9k-rule snapshot through the exact same
expression: ``Column.isin`` compiles to a JVM ``InSet`` (hash lookup,
whole-stage codegen) whose cost is flat in the rule count, and the
DuckDB oracle mirrors the same list via ``IN``. Wildcard (``*.ck``)
and exception (``!www.ck``) rules are not modeled — none of the
bundled registries need them; the full-list swap would add the one
extra wildcard branch.

Single-label rules (``com``, ``org``, every plain ccTLD) need no
table: when no multi-label rule matches, the registrable host is the
last two labels, which is exactly the PSL default rule ``*``.
"""

from __future__ import annotations

# fmt: off
TWO_LABEL_SUFFIXES: tuple[str, ...] = (
    # .uk (Nominet second-level registries)
    "co.uk", "org.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk", "ac.uk",
    "gov.uk", "sch.uk", "nhs.uk", "police.uk", "mod.uk",
    # .au
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # .nz
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz", "mil.nz",
    # .jp
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    # .kr
    "co.kr", "or.kr", "ne.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
    "busan.kr",
    # .cn
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn", "gx.cn",
    "gz.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hk.cn", "hl.cn",
    "hn.cn", "jl.cn", "js.cn", "jx.cn", "ln.cn", "mo.cn", "nm.cn",
    "nx.cn", "qh.cn", "sc.cn", "sd.cn", "sh.cn", "sn.cn", "sx.cn",
    "tj.cn", "tw.cn", "xj.cn", "xz.cn", "yn.cn", "zj.cn",
    # .tw / .hk / .sg / .my / .th / .id / .ph / .vn / .in
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    "co.th", "ac.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "co.id", "ac.id", "go.id", "mil.id", "net.id", "or.id", "sch.id",
    "web.id", "my.id", "biz.id",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph", "ngo.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "ac.vn", "biz.vn",
    "info.vn", "name.vn", "pro.vn", "health.vn", "int.vn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "nic.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in",
    # .br
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    "adv.br", "arq.br", "bio.br", "blog.br", "eco.br", "esp.br",
    "far.br", "flog.br", "fnd.br", "fot.br", "fst.br", "g12.br",
    "ggf.br", "imb.br", "ind.br", "inf.br", "jor.br", "jus.br",
    "leg.br", "lel.br", "mat.br", "med.br", "mus.br", "not.br",
    "ntr.br", "odo.br", "ppg.br", "pro.br", "psc.br", "psi.br",
    "qsl.br", "radio.br", "rec.br", "slg.br", "srv.br", "taxi.br",
    "teo.br", "tmp.br", "trd.br", "tur.br", "tv.br", "vet.br",
    "vlog.br", "wiki.br", "zlg.br",
    # .mx / .ar / .co / .pe / .cl / .ve / .uy / .ec / .bo / .py
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "gov.ar",
    "int.ar", "mil.ar", "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co",
    "nom.co", "rec.co", "web.co", "firm.co", "info.co", "int.co",
    "arts.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve",
    "info.ve", "web.ve", "co.ve",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "mil.ec",
    "fin.ec", "med.ec", "pro.ec", "info.ec",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "mil.bo", "int.bo",
    "web.bo", "tv.bo",
    "com.py", "net.py", "org.py", "edu.py", "gov.py", "mil.py", "coop.py",
    # .za / .ng / .ke / .eg / .ma / .tz / .ug / .gh / .zm / .zw
    "co.za", "net.za", "org.za", "edu.za", "gov.za", "ac.za", "web.za",
    "mil.za", "nom.za", "school.za",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "mil.ng", "name.ng",
    "sch.ng", "i.ng", "mobi.ng",
    "co.ke", "ne.ke", "or.ke", "ac.ke", "go.ke", "info.ke", "me.ke",
    "mobi.ke", "sc.ke",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "mil.eg", "eun.eg",
    "name.eg", "sci.eg",
    "co.ma", "net.ma", "org.ma", "ac.ma", "gov.ma", "press.ma",
    "co.tz", "ne.tz", "or.tz", "ac.tz", "go.tz", "sc.tz", "hotel.tz",
    "info.tz", "me.tz", "mil.tz", "mobi.tz", "tv.tz",
    "co.ug", "ne.ug", "or.ug", "ac.ug", "go.ug", "sc.ug", "com.ug",
    "org.ug",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "co.zm", "com.zm", "org.zm", "edu.zm", "gov.zm", "ac.zm", "sch.zm",
    "net.zm", "mil.zm", "info.zm", "biz.zm",
    "co.zw", "ac.zw", "gov.zw", "mil.zw", "org.zw",
    # .tr / .il / .sa / .ae / .pk / .bd / .lk / .np
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "av.tr",
    "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr", "k12.tr",
    "kep.tr", "name.tr", "pol.tr", "tel.tr", "tsk.tr", "tv.tr", "web.tr",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "k12.il", "muni.il",
    "idf.il",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "pub.sa",
    "sch.sa",
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "fam.pk", "biz.pk",
    "web.pk", "gok.pk", "gob.pk", "gkp.pk", "gop.pk", "gos.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd", "mil.bd",
    "com.lk", "net.lk", "org.lk", "edu.lk", "gov.lk", "sch.lk", "ngo.lk",
    "int.lk", "soc.lk", "web.lk", "ltd.lk", "assn.lk", "grp.lk",
    "hotel.lk", "ac.lk",
    "com.np", "net.np", "org.np", "edu.np", "gov.np", "mil.np", "aero.np",
    "asia.np", "biz.np", "coop.np", "info.np", "museum.np", "name.np",
    # Europe ccTLD second-levels
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "mil.pl", "biz.pl",
    "info.pl", "waw.pl", "warszawa.pl", "krakow.pl", "wroclaw.pl",
    "poznan.pl", "lodz.pl", "gda.pl", "gdansk.pl", "slupsk.pl",
    "szczecin.pl",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt",
    "publ.pt", "nome.pt",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro", "www.ro",
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru", "int.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "kyiv.ua", "lviv.ua", "odessa.ua", "kharkov.ua", "dp.ua", "dn.ua",
    "co.hu", "org.hu", "info.hu", "priv.hu", "tm.hu", "2000.hu",
    "agrar.hu", "bolt.hu", "city.hu", "film.hu",
    "co.cz",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "co.it", "edu.it", "gov.it",
    "co.nl", "com.nl", "net.nl",
    "co.no", "priv.no",
    "com.se", "org.se", "pp.se", "tm.se", "parti.se", "press.se",
    # North America & misc
    "co.us", "com.mt", "net.mt", "org.mt", "edu.mt", "gov.mt",
    "com.cy", "net.cy", "org.cy", "ac.cy", "gov.cy", "biz.cy", "ltd.cy",
    "name.cy", "press.cy", "pro.cy", "tm.cy", "ekloges.cy", "parliament.cy",
    "com.mk", "net.mk", "org.mk", "edu.mk", "gov.mk", "inf.mk", "name.mk",
    "com.ge", "net.ge", "org.ge", "edu.ge", "gov.ge", "mil.ge", "pvt.ge",
    "com.am", "net.am", "org.am", "co.am", "north.am", "south.am",
    "com.by", "net.by", "org.by", "gov.by", "mil.by", "of.by",
    "com.kz", "net.kz", "org.kz", "edu.kz", "gov.kz", "mil.kz",
    "com.uz", "net.uz", "org.uz", "co.uz",
    # common Canadian/provincial and US-style second levels
    "gc.ca", "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca",
    "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca",
    "yk.ca",
)

THREE_LABEL_SUFFIXES: tuple[str, ...] = (
    # .jp prefectural city registries (snapshot of the common ones)
    "city.tokyo.jp", "city.osaka.jp", "city.kyoto.jp", "city.nagoya.jp",
    "city.sapporo.jp", "city.yokohama.jp", "city.kobe.jp",
    "city.fukuoka.jp", "city.kawasaki.jp", "city.hiroshima.jp",
    "city.sendai.jp", "city.kitakyushu.jp", "city.saitama.jp",
    "city.chiba.jp", "city.sakai.jp", "city.niigata.jp",
    "city.hamamatsu.jp", "city.shizuoka.jp", "city.okayama.jp",
    "city.kumamoto.jp",
    # .uk school registries (the PSL's *.sch.uk wildcard, snapshotted to
    # its common explicit forms)
    "pri.sch.uk", "sec.sch.uk",
    # .au state education/government
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au", "act.gov.au", "nsw.gov.au",
    "nt.gov.au", "qld.gov.au", "sa.gov.au", "tas.gov.au", "vic.gov.au",
    "wa.gov.au",
    # .us k12-style registries (snapshot of the common pattern)
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.fl.us", "k12.il.us",
    "k12.ma.us", "k12.wa.us", "k12.pa.us", "k12.oh.us", "k12.mi.us",
    "cc.ca.us", "cc.ny.us", "cc.tx.us", "lib.ca.us", "lib.ny.us",
    "lib.tx.us", "state.ca.us", "state.ny.us", "state.tx.us",
)
# fmt: on


def sql_in_list(rules: tuple[str, ...]) -> str:
    """The rule set as a SQL ``IN (...)`` literal list for the DuckDB
    oracle — the mirror of ``Column.isin(*rules)``."""
    return ", ".join("'" + r + "'" for r in rules)
