"""Language normalization E19 + RTL predicate E20 (``src/lang.ts:3-32``).

``lang639_3(lang)`` matches ``lang`` case-insensitively against a table of
``(iso639_1, iso639_3, english_name, native_name)`` rows and returns the
ISO-639-3 code, or ``''`` when unmatched — exactly the reference lookup
(iso1 and iso3 columns are compared as-is after lowercasing the input,
names are lowercased on both sides; first match wins in table order).

The reference ships a 158-entry table (``src/languages.json``). We carry a
curated table of the same public ISO-639 facts covering the major
languages plus everything the synthetic corpora use; rows keep the same
tuple shape so the lookup semantics are identical. The table is also
exported as inline SQL (:func:`lang_map_sql_values`) so DuckDB oracle
queries can reproduce the mapping exactly.
"""

from __future__ import annotations

__all__ = ["LANGUAGES", "lang639_3", "is_rtl", "lang_map_sql_values", "RTL_CODES"]

# (iso639-1, iso639-3, English name, native name) — public ISO 639 data.
LANGUAGES: list[tuple[str, str, str, str]] = [
    ("af", "afr", "Afrikaans", "Afrikaans"),
    ("am", "amh", "Amharic", "አማርኛ"),
    ("ar", "ara", "Arabic", "العربية"),
    ("az", "aze", "Azerbaijani", "azərbaycan dili"),
    ("be", "bel", "Belarusian", "беларуская мова"),
    ("bg", "bul", "Bulgarian", "български език"),
    ("bn", "ben", "Bengali", "বাংলা"),
    ("bs", "bos", "Bosnian", "bosanski jezik"),
    ("ca", "cat", "Catalan", "català"),
    ("cs", "ces", "Czech", "čeština"),
    ("cy", "cym", "Welsh", "Cymraeg"),
    ("da", "dan", "Danish", "dansk"),
    ("de", "deu", "German", "Deutsch"),
    ("el", "ell", "Greek", "ελληνικά"),
    ("en", "eng", "English", "English"),
    ("eo", "epo", "Esperanto", "Esperanto"),
    ("es", "spa", "Spanish", "Español"),
    ("et", "est", "Estonian", "eesti"),
    ("eu", "eus", "Basque", "euskara"),
    ("fa", "fas", "Persian", "فارسی"),
    ("fi", "fin", "Finnish", "suomi"),
    ("fr", "fra", "French", "Français"),
    ("ga", "gle", "Irish", "Gaeilge"),
    ("gl", "glg", "Galician", "galego"),
    ("gu", "guj", "Gujarati", "ગુજરાતી"),
    ("he", "heb", "Hebrew", "עברית"),
    ("hi", "hin", "Hindi", "हिन्दी"),
    ("hr", "hrv", "Croatian", "hrvatski jezik"),
    ("hu", "hun", "Hungarian", "magyar"),
    ("hy", "hye", "Armenian", "Հայերեն"),
    ("id", "ind", "Indonesian", "Bahasa Indonesia"),
    ("is", "isl", "Icelandic", "Íslenska"),
    ("it", "ita", "Italian", "Italiano"),
    ("ja", "jpn", "Japanese", "日本語"),
    ("ka", "kat", "Georgian", "ქართული"),
    ("kk", "kaz", "Kazakh", "қазақ тілі"),
    ("km", "khm", "Khmer", "ខ្មែរ"),
    ("kn", "kan", "Kannada", "ಕನ್ನಡ"),
    ("ko", "kor", "Korean", "한국어"),
    ("ks", "kas", "Kashmiri", "कश्मीरी"),
    ("ku", "kur", "Kurdish", "Kurdî"),
    ("ky", "kir", "Kyrgyz", "Кыргызча"),
    ("la", "lat", "Latin", "latine"),
    ("lo", "lao", "Lao", "ພາສາລາວ"),
    ("lt", "lit", "Lithuanian", "lietuvių kalba"),
    ("lv", "lav", "Latvian", "latviešu valoda"),
    ("mk", "mkd", "Macedonian", "македонски јазик"),
    ("ml", "mal", "Malayalam", "മലയാളം"),
    ("mn", "mon", "Mongolian", "Монгол хэл"),
    ("mr", "mar", "Marathi", "मराठी"),
    ("ms", "msa", "Malay", "Bahasa Melayu"),
    ("mt", "mlt", "Maltese", "Malti"),
    ("my", "mya", "Burmese", "ဗမာစာ"),
    ("ne", "nep", "Nepali", "नेपाली"),
    ("nl", "nld", "Dutch", "Nederlands"),
    ("no", "nor", "Norwegian", "Norsk"),
    ("pa", "pan", "Punjabi", "ਪੰਜਾਬੀ"),
    ("pl", "pol", "Polish", "język polski"),
    ("ps", "pus", "Pashto", "پښتو"),
    ("pt", "por", "Portuguese", "Português"),
    ("ro", "ron", "Romanian", "Română"),
    ("ru", "rus", "Russian", "русский"),
    ("sd", "snd", "Sindhi", "सिन्धी"),
    ("si", "sin", "Sinhala", "සිංහල"),
    ("sk", "slk", "Slovak", "slovenčina"),
    ("sl", "slv", "Slovenian", "slovenski jezik"),
    ("so", "som", "Somali", "Soomaaliga"),
    ("sq", "sqi", "Albanian", "shqip"),
    ("sr", "srp", "Serbian", "српски језик"),
    ("sv", "swe", "Swedish", "svenska"),
    ("sw", "swa", "Swahili", "Kiswahili"),
    ("ta", "tam", "Tamil", "தமிழ்"),
    ("te", "tel", "Telugu", "తెలుగు"),
    ("tg", "tgk", "Tajik", "тоҷикӣ"),
    ("th", "tha", "Thai", "ไทย"),
    ("tl", "tgl", "Tagalog", "Wikang Tagalog"),
    ("tr", "tur", "Turkish", "Türkçe"),
    ("ug", "uig", "Uighur", "ئۇيغۇرچە"),
    ("uk", "ukr", "Ukrainian", "Українська"),
    ("ur", "urd", "Urdu", "اردو"),
    ("uz", "uzb", "Uzbek", "Oʻzbek"),
    ("vi", "vie", "Vietnamese", "Tiếng Việt"),
    ("yi", "yid", "Yiddish", "ייִדיש"),
    ("zh", "zho", "Chinese", "中文"),
    ("zu", "zul", "Zulu", "isiZulu"),
]

# Precomputed lowercase lookup preserving the reference's first-match-wins
# table-order semantics (src/lang.ts:4-14).
_LOOKUP: dict[str, str] = {}
for _iso1, _iso3, _en, _native in LANGUAGES:
    for key in (_iso1, _iso3, _en.lower(), _native.lower()):
        _LOOKUP.setdefault(key, _iso3)

# src/lang.ts:19-28
RTL_CODES = frozenset(("ara", "heb", "fas", "urd", "kas", "pus", "uig", "snd"))


def lang639_3(lang: str) -> str:
    """Normalize any language designator to ISO-639-3, '' if unknown."""
    return _LOOKUP.get(lang.lower(), "")


def is_rtl(code3: str) -> bool:
    """E20: true iff the ISO-639-3 code is a right-to-left language."""
    return code3 in RTL_CODES


def lang_map_sql_values() -> str:
    """The same mapping as SQL ``(VALUES ...)`` rows ``(key, iso3)``.

    Lets oracle DuckDB queries join text langs through an identical table:
    every lowercase alias (iso1, iso3, english, native) maps to iso3.
    """
    rows = []
    emitted: set[str] = set()
    for iso1, iso3, en, native in LANGUAGES:
        for key in (iso1, iso3, en.lower(), native.lower()):
            if key not in emitted:
                emitted.add(key)
                escaped = key.replace("'", "''")
                rows.append(f"('{escaped}', '{iso3}')")
    return ", ".join(rows)
