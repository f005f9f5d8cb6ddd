"""Language normalization E19 + RTL predicate E20 (``src/lang.ts:3-32``).

``lang639_3(lang)`` matches ``lang`` case-insensitively against a table of
``(iso639_1, iso639_3, english_name, native_name)`` rows and returns the
ISO-639-3 code, or ``''`` when unmatched — exactly the reference lookup
(iso1 and iso3 columns are compared as-is after lowercasing the input,
names are lowercased on both sides; first match wins in table order).

The reference ships a 158-entry table (``src/languages.json``); this
module carries the full 158 rows of the same public ISO-639 facts in the
same tuple shape, so the lookup semantics (including first-match-wins on
alias collisions) are identical. ``languages_fixture.json`` next to this
module holds an INDEPENDENT copy of the same facts used only to generate
DuckDB oracle SQL — the oracle is derived from the fixture, never from
this table, so a table regression is caught by the correctness gate.
"""

from __future__ import annotations

__all__ = ["LANGUAGES", "lang639_3", "is_rtl", "lang_map_sql_values", "RTL_CODES"]

# (iso639-1, iso639-3, English name, native name) — public ISO 639 data.
LANGUAGES: list[tuple[str, str, str, str]] = [
    ('ab', 'abk', 'Abkhazian', 'аҧсуа бызшәа\u200e (Aṗsua byzšwa), аҧсшәа\u200e (Aṗsšwa)'),
    ('aa', 'aar', 'Afar', 'Qafar'),
    ('af', 'afr', 'Afrikaans', 'Afrikaans'),
    ('ak', 'aka', 'Akan', 'Akan'),
    ('sq', 'sqi', 'Albanian', 'shqip'),
    ('am', 'amh', 'Amharic', 'አማርኛ'),
    ('ar', 'ara', 'Arabic', 'العربية'),
    ('an', 'arg', 'Aragonese', 'Aragonés'),
    ('hy', 'hye', 'Armenian', 'հայերեն'),
    ('as', 'asm', 'Assamese', 'অসমীয়া'),
    ('av', 'ava', 'Avaric', 'авар мацӏ\u200e (Awar mac̣), магӏарул мацӏ\u200e (Maʿarul mac̣)'),
    ('az', 'aze', 'Azerbaijani', 'azərbaycan'),
    ('bm', 'bam', 'Bambara', 'bamanakan'),
    ('ba', 'bak', 'Bashkir', 'башҡорт теле\u200e (Başķort tele), башҡортса\u200e (Başķortsa)'),
    ('eu', 'eus', 'Basque', 'euskara'),
    ('be', 'bel', 'Belarusian', 'беларуская'),
    ('bn', 'ben', 'Bengali', 'বাংলা'),
    ('bi', 'bis', 'Bislama', 'Bislama'),
    ('bs', 'bos', 'Bosnian', 'bosanski'),
    ('br', 'bre', 'Breton', 'brezhoneg'),
    ('bg', 'bul', 'Bulgarian', 'български'),
    ('my', 'mya', 'Burmese', 'မြန်မာ'),
    ('ca', 'cat', 'Catalan', 'català'),
    ('ch', 'cha', 'Chamorro', 'Chamorru'),
    ('ce', 'che', 'Chechen', 'нохчийн'),
    ('zh', 'zho', 'Chinese', '中文'),
    ('cu', 'chu', 'Church Slavic', 'церковнослове́нскїй'),
    ('cv', 'chv', 'Chuvash', 'Чӑвашла'),
    ('kw', 'cor', 'Cornish', 'kernewek'),
    ('co', 'cos', 'Corsican', 'Corsu'),
    ('hr', 'hrv', 'Croatian', 'hrvatski'),
    ('cs', 'ces', 'Czech', 'čeština'),
    ('da', 'dan', 'Danish', 'dansk'),
    ('dv', 'div', 'Dhivehi', 'ދިވެހިބަސް'),
    ('nl', 'nld', 'Dutch', 'Nederlands'),
    ('dz', 'dzo', 'Dzongkha', 'རྫོང་ཁ'),
    ('en', 'eng', 'English', 'English'),
    ('eo', 'epo', 'Esperanto', 'esperanto'),
    ('et', 'est', 'Estonian', 'eesti'),
    ('ee', 'ewe', 'Ewe', 'Eʋegbe'),
    ('fo', 'fao', 'Faroese', 'føroyskt'),
    ('fi', 'fin', 'Finnish', 'suomi'),
    ('fr', 'fra', 'French', 'français'),
    ('ff', 'ful', 'Fulah', 'Pulaar'),
    ('gl', 'glg', 'Galician', 'galego'),
    ('lg', 'lug', 'Ganda', 'Luganda'),
    ('ka', 'kat', 'Georgian', 'ქართული'),
    ('de', 'deu', 'German', 'Deutsch'),
    ('gu', 'guj', 'Gujarati', 'ગુજરાતી'),
    ('ht', 'hat', 'Haitian', 'Ayisyen, Kreyòl'),
    ('ha', 'hau', 'Hausa', 'Hausa'),
    ('he', 'heb', 'Hebrew', 'עברית'),
    ('hi', 'hin', 'Hindi', 'हिन्दी'),
    ('hu', 'hun', 'Hungarian', 'magyar'),
    ('is', 'isl', 'Icelandic', 'íslenska'),
    ('ig', 'ibo', 'Igbo', 'Igbo'),
    ('id', 'ind', 'Indonesian', 'Indonesia'),
    ('ia', 'ina', 'Interlingua', 'interlingua'),
    ('iu', 'iku', 'Inuktitut', 'ᐃᓄᒃᑎᑐᑦ'),
    ('ga', 'gle', 'Irish', 'Gaeilge'),
    ('it', 'ita', 'Italian', 'italiano'),
    ('ja', 'jpn', 'Japanese', '日本語'),
    ('jv', 'jav', 'Javanese', 'Basa Jawa'),
    ('kl', 'kal', 'Kalaallisut', 'kalaallisut'),
    ('kn', 'kan', 'Kannada', 'ಕನ್ನಡ'),
    ('ks', 'kas', 'Kashmiri', 'کٲشُر'),
    ('kk', 'kaz', 'Kazakh', 'қазақ тілі'),
    ('km', 'khm', 'Khmer', 'ខ្មែរ'),
    ('ki', 'kik', 'Kikuyu', 'Gikuyu'),
    ('rw', 'kin', 'Kinyarwanda', 'Kinyarwanda'),
    ('ky', 'kir', 'Kirghiz', 'кыргызча'),
    ('ko', 'kor', 'Korean', '한국어'),
    ('kj', 'kua', 'Kuanyama', 'Oshikwanyama'),
    ('ku', 'kur', 'Kurdish', 'kurdî'),
    ('lo', 'lao', 'Lao', 'ລາວ'),
    ('lv', 'lav', 'Latvian', 'latviešu'),
    ('li', 'lim', 'Limburgan', 'Limbourgeois, Limburgs'),
    ('ln', 'lin', 'Lingala', 'lingála'),
    ('lt', 'lit', 'Lithuanian', 'lietuvių'),
    ('lu', 'lub', 'Luba-Katanga', 'Tshiluba'),
    ('lb', 'ltz', 'Luxembourgish', 'Lëtzebuergesch'),
    ('mk', 'mkd', 'Macedonian', 'македонски'),
    ('mg', 'mlg', 'Malagasy', 'Malagasy'),
    ('ms', 'msa', 'Malay', 'Melayu'),
    ('ml', 'mal', 'Malayalam', 'മലയാളം'),
    ('mt', 'mlt', 'Maltese', 'Malti'),
    ('gv', 'glv', 'Manx', 'Gaelg'),
    ('mi', 'mri', 'Maori', 'te reo Maori'),
    ('mr', 'mar', 'Marathi', 'मराठी'),
    ('el', 'ell', 'Modern Greek', 'Ελληνικά'),
    ('mn', 'mon', 'Mongolian', 'монгол'),
    ('nv', 'nav', 'Navajo', 'Diné'),
    ('ne', 'nep', 'Nepali', 'नेपाली'),
    ('nd', 'nde', 'North Ndebele', 'isiNdebele'),
    ('se', 'sme', 'Northern Sami', 'davvisámegiella'),
    ('no', 'nor', 'Norwegian', 'Norsk'),
    ('nn', 'nno', 'Norwegian Nynorsk', 'nynorsk'),
    ('ny', 'nya', 'Nyanja', 'Chichewa, chiCheŵa\u200e (Chichewa), chiNyanja'),
    ('oc', 'oci', 'Occitan', 'occitan'),
    ('or', 'ori', 'Oriya', 'ଓଡ଼ିଆ'),
    ('om', 'orm', 'Oromo', 'Oromoo'),
    ('os', 'oss', 'Ossetian', 'ирон'),
    ('pa', 'pan', 'Panjabi', 'ਪੰਜਾਬੀ'),
    ('fa', 'fas', 'Persian', 'فارسی'),
    ('pl', 'pol', 'Polish', 'polski'),
    ('pt', 'por', 'Portuguese', 'português'),
    ('ps', 'pus', 'Pushto', 'پښتو'),
    ('qu', 'que', 'Quechua', 'Runasimi'),
    ('ro', 'ron', 'Romanian', 'română'),
    ('rm', 'roh', 'Romansh', 'rumantsch'),
    ('rn', 'run', 'Rundi', 'Ikirundi'),
    ('ru', 'rus', 'Russian', 'русский'),
    ('sm', 'smo', 'Samoan', 'Gagana Samoa'),
    ('sg', 'sag', 'Sango', 'Sängö'),
    ('sa', 'san', 'Sanskrit', 'संस्कृत भाषा'),
    ('gd', 'gla', 'Scottish Gaelic', 'Gàidhlig'),
    ('sr', 'srp', 'Serbian', 'српски'),
    ('sn', 'sna', 'Shona', 'chiShona'),
    ('ii', 'iii', 'Sichuan Yi', 'ꆈꌠꉙ'),
    ('sd', 'snd', 'Sindhi', 'سنڌي'),
    ('si', 'sin', 'Sinhala', 'සිංහල'),
    ('sk', 'slk', 'Slovak', 'slovenčina'),
    ('sl', 'slv', 'Slovenian', 'slovenščina'),
    ('so', 'som', 'Somali', 'Soomaali'),
    ('nr', 'nbl', 'South Ndebele', 'isiNdebele'),
    ('st', 'sot', 'Southern Sotho', 'Sesotho'),
    ('es', 'spa', 'Spanish', 'español'),
    ('su', 'sun', 'Sundanese', 'Sunda'),
    ('sw', 'swa', 'Swahili', 'Kiswahili'),
    ('ss', 'ssw', 'Swati', 'siSwati'),
    ('sv', 'swe', 'Swedish', 'svenska'),
    ('tl', 'tgl', 'Tagalog', 'Tagalog'),
    ('ty', 'tah', 'Tahitian', 'Reo Tahiti'),
    ('tg', 'tgk', 'Tajik', 'тоҷикӣ'),
    ('ta', 'tam', 'Tamil', 'தமிழ்'),
    ('tt', 'tat', 'Tatar', 'татар'),
    ('te', 'tel', 'Telugu', 'తెలుగు'),
    ('th', 'tha', 'Thai', 'ไทย'),
    ('bo', 'bod', 'Tibetan', 'བོད་སྐད་'),
    ('ti', 'tir', 'Tigrinya', 'ትግርኛ'),
    ('to', 'ton', 'Tonga', 'lea fakatonga'),
    ('ts', 'tso', 'Tsonga', 'Xitsonga'),
    ('tn', 'tsn', 'Tswana', 'Setswana'),
    ('tr', 'tur', 'Turkish', 'Türkçe'),
    ('tk', 'tuk', 'Turkmen', 'Türkmen dili'),
    ('ug', 'uig', 'Uighur', 'ئۇيغۇرچە'),
    ('uk', 'ukr', 'Ukrainian', 'українська'),
    ('ur', 'urd', 'Urdu', 'اردو'),
    ('uz', 'uzb', 'Uzbek', 'o‘zbek'),
    ('ve', 'ven', 'Venda', 'Tshivenḓa'),
    ('vi', 'vie', 'Vietnamese', 'Tiếng Việt'),
    ('cy', 'cym', 'Welsh', 'Cymraeg'),
    ('fy', 'fry', 'Western Frisian', 'Frysk'),
    ('wo', 'wol', 'Wolof', 'Wolof'),
    ('xh', 'xho', 'Xhosa', 'isiXhosa'),
    ('yi', 'yid', 'Yiddish', 'ייִדיש'),
    ('yo', 'yor', 'Yoruba', 'Èdè Yorùbá'),
    ('zu', 'zul', 'Zulu', 'isiZulu'),
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
