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
# one char matching Python [^\w\s] (the symbolic-bullet class), Java
# (?U) context: either a Java-word char Python does NOT count as word
# (combining marks), or not-word/space under the Python-adjusted sets
PY_NONWORDSPACE_CHAR = ("(?:[" + JAVA_WORD_EXCESS + "]|[^\\w\\s"
                        + "\\x1c-\\x1f" + JAVA_WORD_EXTRA + "])")
