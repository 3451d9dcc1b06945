"""MEASURED Unicode-class skew constants — GENERATED, do not edit.

Regenerate + verify with ``python scripts/unicode_skew.py`` (add
``--emit`` to rewrite this file).  Provenance: CPython 3.11 ships
Unicode 14.0 tables, Java 17 (the Spark JVM) ships 13.0, DuckDB's RE2
ships 15.x — so ``str.isalpha()`` / ``re`` ``\\d \\w \\s`` and their
naive ``\\p{L}`` / ``(?U)`` transcriptions disagree on the codepoints
(re)assigned between those versions.  Every constant below is the
exact measured delta from sweeping ALL codepoints through the live
engines (r7 fuzz program; the stage-18 vocabulary-bucket divergence on
U+9FFF was the motivating catch).

Measured facts the transcriptions rely on:
  * WHITESPACE needs no correction anywhere: Java ``(?U)[\\s\\x1c-\\x1f]``
    and RE2 ``[\\s\\x{0B}\\p{Z}\\x{85}\\x{1C}-\\x{1F}]`` both equal
    ``str.isspace()`` / ``re \\s`` EXACTLY over all codepoints.
  * Java letters are a strict SUBSET of CPython letters (+515 cps);
    RE2 letters a strict SUPERSET (-4348 cps).
  * Java ``(?U)\\d`` misses the 10 Tangsa digits (Unicode 14).
  * CPython ``\\w`` adds Nl/No numerics (isalnum) and Unicode-14
    letters (+1420 cps) while Java ``(?U)\\w`` adds combining marks
    CPython excludes (-2436 cps).
"""

JAVA_ALPHA_EXTRA = (
    r"\x{870}-\x{887}\x{889}-\x{88E}\x{8B5}\x{8C8}-\x{8C9}\x{C5D}"
    r"\x{CDD}\x{170D}\x{171F}\x{1B4C}\x{2C2F}\x{2C5F}\x{9FFD}-\x{9FFF}"
    r"\x{A7C0}-\x{A7C1}\x{A7D0}-\x{A7D1}\x{A7D3}\x{A7D5}-\x{A7D9}"
    r"\x{A7F2}-\x{A7F4}\x{10570}-\x{1057A}\x{1057C}-\x{1058A}"
    r"\x{1058C}-\x{10592}\x{10594}-\x{10595}\x{10597}-\x{105A1}"
    r"\x{105A3}-\x{105B1}\x{105B3}-\x{105B9}\x{105BB}-\x{105BC}"
    r"\x{10780}-\x{10785}\x{10787}-\x{107B0}\x{107B2}-\x{107BA}"
    r"\x{10F70}-\x{10F81}\x{11071}-\x{11072}\x{11075}"
    r"\x{11740}-\x{11746}\x{11AB0}-\x{11ABF}\x{12F90}-\x{12FF0}"
    r"\x{16A70}-\x{16ABE}\x{1AFF0}-\x{1AFF3}\x{1AFF5}-\x{1AFFB}"
    r"\x{1AFFD}-\x{1AFFE}\x{1B11F}-\x{1B122}\x{1DF00}-\x{1DF1E}"
    r"\x{1E290}-\x{1E2AD}\x{1E7E0}-\x{1E7E6}\x{1E7E8}-\x{1E7EB}"
    r"\x{1E7ED}-\x{1E7EE}\x{1E7F0}-\x{1E7FE}\x{2A6DE}-\x{2A6DF}"
    r"\x{2B735}-\x{2B738}")

# RE2 letters NOT Python-alpha (Unicode-15 additions)
RE2_ALPHA_EXCESS = (
    r"\x{1123F}-\x{11240}\x{11F02}\x{11F04}-\x{11F10}"
    r"\x{11F12}-\x{11F33}\x{1342F}\x{13441}-\x{13446}\x{1B132}"
    r"\x{1B155}\x{1DF25}-\x{1DF2A}\x{1E030}-\x{1E06D}"
    r"\x{1E4D0}-\x{1E4EB}\x{2B739}\x{31350}-\x{323AF}")

# Python re \\d minus Java (?U)\\d (Tangsa digits)
JAVA_DIGIT_EXTRA = (
    r"\x{16AC0}-\x{16AC9}")

# Python re \\w minus Java (?U)\\w (Nl/No numerics + U14 letters)
JAVA_WORD_EXTRA = (
    r"\x{B2}-\x{B3}\x{B9}\x{BC}-\x{BE}\x{870}-\x{887}\x{889}-\x{88E}"
    r"\x{8B5}\x{8C8}-\x{8C9}\x{9F4}-\x{9F9}\x{B72}-\x{B77}"
    r"\x{BF0}-\x{BF2}\x{C5D}\x{C78}-\x{C7E}\x{CDD}\x{D58}-\x{D5E}"
    r"\x{D70}-\x{D78}\x{F2A}-\x{F33}\x{1369}-\x{137C}\x{170D}\x{171F}"
    r"\x{17F0}-\x{17F9}\x{19DA}\x{1B4C}\x{2070}\x{2074}-\x{2079}"
    r"\x{2080}-\x{2089}\x{2150}-\x{215F}\x{2189}\x{2460}-\x{249B}"
    r"\x{24EA}-\x{24FF}\x{2776}-\x{2793}\x{2C2F}\x{2C5F}\x{2CFD}"
    r"\x{3192}-\x{3195}\x{3220}-\x{3229}\x{3248}-\x{324F}"
    r"\x{3251}-\x{325F}\x{3280}-\x{3289}\x{32B1}-\x{32BF}"
    r"\x{9FFD}-\x{9FFF}\x{A7C0}-\x{A7C1}\x{A7D0}-\x{A7D1}\x{A7D3}"
    r"\x{A7D5}-\x{A7D9}\x{A7F2}-\x{A7F4}\x{A830}-\x{A835}"
    r"\x{10107}-\x{10133}\x{10175}-\x{10178}\x{1018A}-\x{1018B}"
    r"\x{102E1}-\x{102FB}\x{10320}-\x{10323}\x{10570}-\x{1057A}"
    r"\x{1057C}-\x{1058A}\x{1058C}-\x{10592}\x{10594}-\x{10595}"
    r"\x{10597}-\x{105A1}\x{105A3}-\x{105B1}\x{105B3}-\x{105B9}"
    r"\x{105BB}-\x{105BC}\x{10780}-\x{10785}\x{10787}-\x{107B0}"
    r"\x{107B2}-\x{107BA}\x{10858}-\x{1085F}\x{10879}-\x{1087F}"
    r"\x{108A7}-\x{108AF}\x{108FB}-\x{108FF}\x{10916}-\x{1091B}"
    r"\x{109BC}-\x{109BD}\x{109C0}-\x{109CF}\x{109D2}-\x{109FF}"
    r"\x{10A40}-\x{10A48}\x{10A7D}-\x{10A7E}\x{10A9D}-\x{10A9F}"
    r"\x{10AEB}-\x{10AEF}\x{10B58}-\x{10B5F}\x{10B78}-\x{10B7F}"
    r"\x{10BA9}-\x{10BAF}\x{10CFA}-\x{10CFF}\x{10E60}-\x{10E7E}"
    r"\x{10F1D}-\x{10F26}\x{10F51}-\x{10F54}\x{10F70}-\x{10F81}"
    r"\x{10FC5}-\x{10FCB}\x{11052}-\x{11065}\x{11071}-\x{11072}"
    r"\x{11075}\x{111E1}-\x{111F4}\x{1173A}-\x{1173B}"
    r"\x{11740}-\x{11746}\x{118EA}-\x{118F2}\x{11AB0}-\x{11ABF}"
    r"\x{11C5A}-\x{11C6C}\x{11FC0}-\x{11FD4}\x{12F90}-\x{12FF0}"
    r"\x{16A70}-\x{16ABE}\x{16AC0}-\x{16AC9}\x{16B5B}-\x{16B61}"
    r"\x{16E80}-\x{16E96}\x{1AFF0}-\x{1AFF3}\x{1AFF5}-\x{1AFFB}"
    r"\x{1AFFD}-\x{1AFFE}\x{1B11F}-\x{1B122}\x{1D2E0}-\x{1D2F3}"
    r"\x{1D360}-\x{1D378}\x{1DF00}-\x{1DF1E}\x{1E290}-\x{1E2AD}"
    r"\x{1E7E0}-\x{1E7E6}\x{1E7E8}-\x{1E7EB}\x{1E7ED}-\x{1E7EE}"
    r"\x{1E7F0}-\x{1E7FE}\x{1E8C7}-\x{1E8CF}\x{1EC71}-\x{1ECAB}"
    r"\x{1ECAD}-\x{1ECAF}\x{1ECB1}-\x{1ECB4}\x{1ED01}-\x{1ED2D}"
    r"\x{1ED2F}-\x{1ED3D}\x{1F100}-\x{1F10C}\x{2A6DE}-\x{2A6DF}"
    r"\x{2B735}-\x{2B738}")

# Java (?U)\\w minus Python re \\w (combining marks Mn/Mc/Me)
JAVA_WORD_EXCESS = (
    r"\x{300}-\x{36F}\x{483}-\x{489}\x{591}-\x{5BD}\x{5BF}"
    r"\x{5C1}-\x{5C2}\x{5C4}-\x{5C5}\x{5C7}\x{610}-\x{61A}"
    r"\x{64B}-\x{65F}\x{670}\x{6D6}-\x{6DC}\x{6DF}-\x{6E4}"
    r"\x{6E7}-\x{6E8}\x{6EA}-\x{6ED}\x{711}\x{730}-\x{74A}"
    r"\x{7A6}-\x{7B0}\x{7EB}-\x{7F3}\x{7FD}\x{816}-\x{819}"
    r"\x{81B}-\x{823}\x{825}-\x{827}\x{829}-\x{82D}\x{859}-\x{85B}"
    r"\x{8D3}-\x{8E1}\x{8E3}-\x{903}\x{93A}-\x{93C}\x{93E}-\x{94F}"
    r"\x{951}-\x{957}\x{962}-\x{963}\x{981}-\x{983}\x{9BC}"
    r"\x{9BE}-\x{9C4}\x{9C7}-\x{9C8}\x{9CB}-\x{9CD}\x{9D7}"
    r"\x{9E2}-\x{9E3}\x{9FE}\x{A01}-\x{A03}\x{A3C}\x{A3E}-\x{A42}"
    r"\x{A47}-\x{A48}\x{A4B}-\x{A4D}\x{A51}\x{A70}-\x{A71}\x{A75}"
    r"\x{A81}-\x{A83}\x{ABC}\x{ABE}-\x{AC5}\x{AC7}-\x{AC9}"
    r"\x{ACB}-\x{ACD}\x{AE2}-\x{AE3}\x{AFA}-\x{AFF}\x{B01}-\x{B03}"
    r"\x{B3C}\x{B3E}-\x{B44}\x{B47}-\x{B48}\x{B4B}-\x{B4D}"
    r"\x{B55}-\x{B57}\x{B62}-\x{B63}\x{B82}\x{BBE}-\x{BC2}"
    r"\x{BC6}-\x{BC8}\x{BCA}-\x{BCD}\x{BD7}\x{C00}-\x{C04}"
    r"\x{C3E}-\x{C44}\x{C46}-\x{C48}\x{C4A}-\x{C4D}\x{C55}-\x{C56}"
    r"\x{C62}-\x{C63}\x{C81}-\x{C83}\x{CBC}\x{CBE}-\x{CC4}"
    r"\x{CC6}-\x{CC8}\x{CCA}-\x{CCD}\x{CD5}-\x{CD6}\x{CE2}-\x{CE3}"
    r"\x{D00}-\x{D03}\x{D3B}-\x{D3C}\x{D3E}-\x{D44}\x{D46}-\x{D48}"
    r"\x{D4A}-\x{D4D}\x{D57}\x{D62}-\x{D63}\x{D81}-\x{D83}\x{DCA}"
    r"\x{DCF}-\x{DD4}\x{DD6}\x{DD8}-\x{DDF}\x{DF2}-\x{DF3}\x{E31}"
    r"\x{E34}-\x{E3A}\x{E47}-\x{E4E}\x{EB1}\x{EB4}-\x{EBC}"
    r"\x{EC8}-\x{ECD}\x{F18}-\x{F19}\x{F35}\x{F37}\x{F39}"
    r"\x{F3E}-\x{F3F}\x{F71}-\x{F84}\x{F86}-\x{F87}\x{F8D}-\x{F97}"
    r"\x{F99}-\x{FBC}\x{FC6}\x{102B}-\x{103E}\x{1056}-\x{1059}"
    r"\x{105E}-\x{1060}\x{1062}-\x{1064}\x{1067}-\x{106D}"
    r"\x{1071}-\x{1074}\x{1082}-\x{108D}\x{108F}\x{109A}-\x{109D}"
    r"\x{135D}-\x{135F}\x{1712}-\x{1714}\x{1732}-\x{1734}"
    r"\x{1752}-\x{1753}\x{1772}-\x{1773}\x{17B4}-\x{17D3}\x{17DD}"
    r"\x{180B}-\x{180D}\x{1885}-\x{1886}\x{18A9}\x{1920}-\x{192B}"
    r"\x{1930}-\x{193B}\x{1A17}-\x{1A1B}\x{1A55}-\x{1A5E}"
    r"\x{1A60}-\x{1A7C}\x{1A7F}\x{1AB0}-\x{1AC0}\x{1B00}-\x{1B04}"
    r"\x{1B34}-\x{1B44}\x{1B6B}-\x{1B73}\x{1B80}-\x{1B82}"
    r"\x{1BA1}-\x{1BAD}\x{1BE6}-\x{1BF3}\x{1C24}-\x{1C37}"
    r"\x{1CD0}-\x{1CD2}\x{1CD4}-\x{1CE8}\x{1CED}\x{1CF4}"
    r"\x{1CF7}-\x{1CF9}\x{1DC0}-\x{1DF9}\x{1DFB}-\x{1DFF}"
    r"\x{200C}-\x{200D}\x{203F}-\x{2040}\x{2054}\x{20D0}-\x{20F0}"
    r"\x{24B6}-\x{24E9}\x{2CEF}-\x{2CF1}\x{2D7F}\x{2DE0}-\x{2DFF}"
    r"\x{302A}-\x{302F}\x{3099}-\x{309A}\x{A66F}-\x{A672}"
    r"\x{A674}-\x{A67D}\x{A69E}-\x{A69F}\x{A6F0}-\x{A6F1}\x{A802}"
    r"\x{A806}\x{A80B}\x{A823}-\x{A827}\x{A82C}\x{A880}-\x{A881}"
    r"\x{A8B4}-\x{A8C5}\x{A8E0}-\x{A8F1}\x{A8FF}\x{A926}-\x{A92D}"
    r"\x{A947}-\x{A953}\x{A980}-\x{A983}\x{A9B3}-\x{A9C0}\x{A9E5}"
    r"\x{AA29}-\x{AA36}\x{AA43}\x{AA4C}-\x{AA4D}\x{AA7B}-\x{AA7D}"
    r"\x{AAB0}\x{AAB2}-\x{AAB4}\x{AAB7}-\x{AAB8}\x{AABE}-\x{AABF}"
    r"\x{AAC1}\x{AAEB}-\x{AAEF}\x{AAF5}-\x{AAF6}\x{ABE3}-\x{ABEA}"
    r"\x{ABEC}-\x{ABED}\x{FB1E}\x{FE00}-\x{FE0F}\x{FE20}-\x{FE2F}"
    r"\x{FE33}-\x{FE34}\x{FE4D}-\x{FE4F}\x{FF3F}\x{101FD}\x{102E0}"
    r"\x{10376}-\x{1037A}\x{10A01}-\x{10A03}\x{10A05}-\x{10A06}"
    r"\x{10A0C}-\x{10A0F}\x{10A38}-\x{10A3A}\x{10A3F}"
    r"\x{10AE5}-\x{10AE6}\x{10D24}-\x{10D27}\x{10EAB}-\x{10EAC}"
    r"\x{10F46}-\x{10F50}\x{11000}-\x{11002}\x{11038}-\x{11046}"
    r"\x{1107F}-\x{11082}\x{110B0}-\x{110BA}\x{11100}-\x{11102}"
    r"\x{11127}-\x{11134}\x{11145}-\x{11146}\x{11173}"
    r"\x{11180}-\x{11182}\x{111B3}-\x{111C0}\x{111C9}-\x{111CC}"
    r"\x{111CE}-\x{111CF}\x{1122C}-\x{11237}\x{1123E}"
    r"\x{112DF}-\x{112EA}\x{11300}-\x{11303}\x{1133B}-\x{1133C}"
    r"\x{1133E}-\x{11344}\x{11347}-\x{11348}\x{1134B}-\x{1134D}"
    r"\x{11357}\x{11362}-\x{11363}\x{11366}-\x{1136C}"
    r"\x{11370}-\x{11374}\x{11435}-\x{11446}\x{1145E}"
    r"\x{114B0}-\x{114C3}\x{115AF}-\x{115B5}\x{115B8}-\x{115C0}"
    r"\x{115DC}-\x{115DD}\x{11630}-\x{11640}\x{116AB}-\x{116B7}"
    r"\x{1171D}-\x{1172B}\x{1182C}-\x{1183A}\x{11930}-\x{11935}"
    r"\x{11937}-\x{11938}\x{1193B}-\x{1193E}\x{11940}"
    r"\x{11942}-\x{11943}\x{119D1}-\x{119D7}\x{119DA}-\x{119E0}"
    r"\x{119E4}\x{11A01}-\x{11A0A}\x{11A33}-\x{11A39}"
    r"\x{11A3B}-\x{11A3E}\x{11A47}\x{11A51}-\x{11A5B}"
    r"\x{11A8A}-\x{11A99}\x{11C2F}-\x{11C36}\x{11C38}-\x{11C3F}"
    r"\x{11C92}-\x{11CA7}\x{11CA9}-\x{11CB6}\x{11D31}-\x{11D36}"
    r"\x{11D3A}\x{11D3C}-\x{11D3D}\x{11D3F}-\x{11D45}\x{11D47}"
    r"\x{11D8A}-\x{11D8E}\x{11D90}-\x{11D91}\x{11D93}-\x{11D97}"
    r"\x{11EF3}-\x{11EF6}\x{16AF0}-\x{16AF4}\x{16B30}-\x{16B36}"
    r"\x{16F4F}\x{16F51}-\x{16F87}\x{16F8F}-\x{16F92}\x{16FE4}"
    r"\x{16FF0}-\x{16FF1}\x{1BC9D}-\x{1BC9E}\x{1D165}-\x{1D169}"
    r"\x{1D16D}-\x{1D172}\x{1D17B}-\x{1D182}\x{1D185}-\x{1D18B}"
    r"\x{1D1AA}-\x{1D1AD}\x{1D242}-\x{1D244}\x{1DA00}-\x{1DA36}"
    r"\x{1DA3B}-\x{1DA6C}\x{1DA75}\x{1DA84}\x{1DA9B}-\x{1DA9F}"
    r"\x{1DAA1}-\x{1DAAF}\x{1E000}-\x{1E006}\x{1E008}-\x{1E018}"
    r"\x{1E01B}-\x{1E021}\x{1E023}-\x{1E024}\x{1E026}-\x{1E02A}"
    r"\x{1E130}-\x{1E136}\x{1E2EC}-\x{1E2EF}\x{1E8D0}-\x{1E8D6}"
    r"\x{1E944}-\x{1E94A}\x{1F130}-\x{1F149}\x{1F150}-\x{1F169}"
    r"\x{1F170}-\x{1F189}\x{E0100}-\x{E01EF}")

# CPython upper-alpha (isalpha & isupper == category Lu under CPython's tables)
# minus Java \\p{Lu} (Unicode-14 additions, e.g. Vithkuqi)
JAVA_UPPER_EXTRA = (
    r"\x{2C2F}\x{A7C0}\x{A7D0}\x{A7D6}\x{A7D8}\x{10570}-\x{1057A}"
    r"\x{1057C}-\x{1058A}\x{1058C}-\x{10592}\x{10594}-\x{10595}")


# ---------------------------------------------------------------------------
# derived single-char pattern fragments (Java fragments assume the
# enclosing pattern carries the (?U) flag)
# ---------------------------------------------------------------------------

# one Python-isalpha char, Java regex
PY_ALPHA_CHAR = "[\\p{L}" + JAVA_ALPHA_EXTRA + "]"
# one Python-isalpha char, RE2 (DuckDB): letter AND NOT a U15-only cp
PY_ALPHA_CHAR_RE2 = "[^\\P{L}" + RE2_ALPHA_EXCESS + "]"
# one Python re-\d char, Java (?U) context
PY_DIGIT_CHAR = "[\\d" + JAVA_DIGIT_EXTRA + "]"
# one Python re-\s char, Java (?U) context (isspace-faithful)
PY_SPACE_CHAR = "[\\s\\x1c-\\x1f]"
# one CPython upper-alpha char (isalpha() and isupper()), Java regex.
# Measured: the set equals category Lu under CPython's tables (no
# Other_Uppercase survivor is isalpha), Java 17's Lu is a strict
# subset (Unicode-14 additions), RE2's Lu matches it EXACTLY.
PY_UPPER_ALPHA_CHAR = "[\\p{Lu}" + JAVA_UPPER_EXTRA + "]"
# same class, RE2 (DuckDB) — measured exactly equal, no correction
PY_UPPER_ALPHA_CHAR_RE2 = "\\p{Lu}"
# one char matching Python [^\w\s] (the symbolic-bullet class), Java
# (?U) context: either a Java-word char Python does NOT count as word
# (combining marks), or not-word/space under the Python-adjusted sets
PY_NONWORDSPACE_CHAR = ("(?:[" + JAVA_WORD_EXCESS + "]|[^\\w\\s"
                        + "\\x1c-\\x1f" + JAVA_WORD_EXTRA + "])")


# ---------------------------------------------------------------------------
# Python int() accepts ANY Unicode-Nd digit ('١٢٣' == 123), so a
# CPython-faithful numeric parse of a \d+ capture must translate the
# non-ASCII digits to their decimal values before cast (one char per
# Nd codepoint, F.translate-ready)
# ---------------------------------------------------------------------------

NON_ASCII_ND_SRC = "\u0660\u0661\u0662\u0663\u0664\u0665\u0666\u0667\u0668\u0669\u06F0\u06F1\u06F2\u06F3\u06F4\u06F5\u06F6\u06F7\u06F8\u06F9\u07C0\u07C1\u07C2\u07C3\u07C4\u07C5\u07C6\u07C7\u07C8\u07C9\u0966\u0967\u0968\u0969\u096A\u096B\u096C\u096D\u096E\u096F\u09E6\u09E7\u09E8\u09E9\u09EA\u09EB\u09EC\u09ED\u09EE\u09EF\u0A66\u0A67\u0A68\u0A69\u0A6A\u0A6B\u0A6C\u0A6D\u0A6E\u0A6F\u0AE6\u0AE7\u0AE8\u0AE9\u0AEA\u0AEB\u0AEC\u0AED\u0AEE\u0AEF\u0B66\u0B67\u0B68\u0B69\u0B6A\u0B6B\u0B6C\u0B6D\u0B6E\u0B6F\u0BE6\u0BE7\u0BE8\u0BE9\u0BEA\u0BEB\u0BEC\u0BED\u0BEE\u0BEF\u0C66\u0C67\u0C68\u0C69\u0C6A\u0C6B\u0C6C\u0C6D\u0C6E\u0C6F\u0CE6\u0CE7\u0CE8\u0CE9\u0CEA\u0CEB\u0CEC\u0CED\u0CEE\u0CEF\u0D66\u0D67\u0D68\u0D69\u0D6A\u0D6B\u0D6C\u0D6D\u0D6E\u0D6F\u0DE6\u0DE7\u0DE8\u0DE9\u0DEA\u0DEB\u0DEC\u0DED\u0DEE\u0DEF\u0E50\u0E51\u0E52\u0E53\u0E54\u0E55\u0E56\u0E57\u0E58\u0E59\u0ED0\u0ED1\u0ED2\u0ED3\u0ED4\u0ED5\u0ED6\u0ED7\u0ED8\u0ED9\u0F20\u0F21\u0F22\u0F23\u0F24\u0F25\u0F26\u0F27\u0F28\u0F29\u1040\u1041\u1042\u1043\u1044\u1045\u1046\u1047\u1048\u1049\u1090\u1091\u1092\u1093\u1094\u1095\u1096\u1097\u1098\u1099\u17E0\u17E1\u17E2\u17E3\u17E4\u17E5\u17E6\u17E7\u17E8\u17E9\u1810\u1811\u1812\u1813\u1814\u1815\u1816\u1817\u1818\u1819\u1946\u1947\u1948\u1949\u194A\u194B\u194C\u194D\u194E\u194F\u19D0\u19D1\u19D2\u19D3\u19D4\u19D5\u19D6\u19D7\u19D8\u19D9\u1A80\u1A81\u1A82\u1A83\u1A84\u1A85\u1A86\u1A87\u1A88\u1A89\u1A90\u1A91\u1A92\u1A93\u1A94\u1A95\u1A96\u1A97\u1A98\u1A99\u1B50\u1B51\u1B52\u1B53\u1B54\u1B55\u1B56\u1B57\u1B58\u1B59\u1BB0\u1BB1\u1BB2\u1BB3\u1BB4\u1BB5\u1BB6\u1BB7\u1BB8\u1BB9\u1C40\u1C41\u1C42\u1C43\u1C44\u1C45\u1C46\u1C47\u1C48\u1C49\u1C50\u1C51\u1C52\u1C53\u1C54\u1C55\u1C56\u1C57\u1C58\u1C59\uA620\uA621\uA622\uA623\uA624\uA625\uA626\uA627\uA628\uA629\uA8D0\uA8D1\uA8D2\uA8D3\uA8D4\uA8D5\uA8D6\uA8D7\uA8D8\uA8D9\uA900\uA901\uA902\uA903\uA904\uA905\uA906\uA907\uA908\uA909\uA9D0\uA9D1\uA9D2\uA9D3\uA9D4\uA9D5\uA9D6\uA9D7\uA9D8\uA9D9\uA9F0\uA9F1\uA9F2\uA9F3\uA9F4\uA9F5\uA9F6\uA9F7\uA9F8\uA9F9\uAA50\uAA51\uAA52\uAA53\uAA54\uAA55\uAA56\uAA57\uAA58\uAA59\uABF0\uABF1\uABF2\uABF3\uABF4\uABF5\uABF6\uABF7\uABF8\uABF9\uFF10\uFF11\uFF12\uFF13\uFF14\uFF15\uFF16\uFF17\uFF18\uFF19\U000104A0\U000104A1\U000104A2\U000104A3\U000104A4\U000104A5\U000104A6\U000104A7\U000104A8\U000104A9\U00010D30\U00010D31\U00010D32\U00010D33\U00010D34\U00010D35\U00010D36\U00010D37\U00010D38\U00010D39\U00011066\U00011067\U00011068\U00011069\U0001106A\U0001106B\U0001106C\U0001106D\U0001106E\U0001106F\U000110F0\U000110F1\U000110F2\U000110F3\U000110F4\U000110F5\U000110F6\U000110F7\U000110F8\U000110F9\U00011136\U00011137\U00011138\U00011139\U0001113A\U0001113B\U0001113C\U0001113D\U0001113E\U0001113F\U000111D0\U000111D1\U000111D2\U000111D3\U000111D4\U000111D5\U000111D6\U000111D7\U000111D8\U000111D9\U000112F0\U000112F1\U000112F2\U000112F3\U000112F4\U000112F5\U000112F6\U000112F7\U000112F8\U000112F9\U00011450\U00011451\U00011452\U00011453\U00011454\U00011455\U00011456\U00011457\U00011458\U00011459\U000114D0\U000114D1\U000114D2\U000114D3\U000114D4\U000114D5\U000114D6\U000114D7\U000114D8\U000114D9\U00011650\U00011651\U00011652\U00011653\U00011654\U00011655\U00011656\U00011657\U00011658\U00011659\U000116C0\U000116C1\U000116C2\U000116C3\U000116C4\U000116C5\U000116C6\U000116C7\U000116C8\U000116C9\U00011730\U00011731\U00011732\U00011733\U00011734\U00011735\U00011736\U00011737\U00011738\U00011739\U000118E0\U000118E1\U000118E2\U000118E3\U000118E4\U000118E5\U000118E6\U000118E7\U000118E8\U000118E9\U00011950\U00011951\U00011952\U00011953\U00011954\U00011955\U00011956\U00011957\U00011958\U00011959\U00011C50\U00011C51\U00011C52\U00011C53\U00011C54\U00011C55\U00011C56\U00011C57\U00011C58\U00011C59\U00011D50\U00011D51\U00011D52\U00011D53\U00011D54\U00011D55\U00011D56\U00011D57\U00011D58\U00011D59\U00011DA0\U00011DA1\U00011DA2\U00011DA3\U00011DA4\U00011DA5\U00011DA6\U00011DA7\U00011DA8\U00011DA9\U00016A60\U00016A61\U00016A62\U00016A63\U00016A64\U00016A65\U00016A66\U00016A67\U00016A68\U00016A69\U00016AC0\U00016AC1\U00016AC2\U00016AC3\U00016AC4\U00016AC5\U00016AC6\U00016AC7\U00016AC8\U00016AC9\U00016B50\U00016B51\U00016B52\U00016B53\U00016B54\U00016B55\U00016B56\U00016B57\U00016B58\U00016B59\U0001D7CE\U0001D7CF\U0001D7D0\U0001D7D1\U0001D7D2\U0001D7D3\U0001D7D4\U0001D7D5\U0001D7D6\U0001D7D7\U0001D7D8\U0001D7D9\U0001D7DA\U0001D7DB\U0001D7DC\U0001D7DD\U0001D7DE\U0001D7DF\U0001D7E0\U0001D7E1\U0001D7E2\U0001D7E3\U0001D7E4\U0001D7E5\U0001D7E6\U0001D7E7\U0001D7E8\U0001D7E9\U0001D7EA\U0001D7EB\U0001D7EC\U0001D7ED\U0001D7EE\U0001D7EF\U0001D7F0\U0001D7F1\U0001D7F2\U0001D7F3\U0001D7F4\U0001D7F5\U0001D7F6\U0001D7F7\U0001D7F8\U0001D7F9\U0001D7FA\U0001D7FB\U0001D7FC\U0001D7FD\U0001D7FE\U0001D7FF\U0001E140\U0001E141\U0001E142\U0001E143\U0001E144\U0001E145\U0001E146\U0001E147\U0001E148\U0001E149\U0001E2F0\U0001E2F1\U0001E2F2\U0001E2F3\U0001E2F4\U0001E2F5\U0001E2F6\U0001E2F7\U0001E2F8\U0001E2F9\U0001E950\U0001E951\U0001E952\U0001E953\U0001E954\U0001E955\U0001E956\U0001E957\U0001E958\U0001E959\U0001FBF0\U0001FBF1\U0001FBF2\U0001FBF3\U0001FBF4\U0001FBF5\U0001FBF6\U0001FBF7\U0001FBF8\U0001FBF9"
NON_ASCII_ND_DST = "01234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789"
