"""Shared per-language lexical profiles (deterministic, embedded).

Used by three consumers so the whole system is self-consistent with no
external data (fastText/kenlm wheels are unavailable in this environment —
SURVEY.md §2.11): the language-ID scorer (stopword + charset evidence), the
character n-gram LM (seed text synthesis for training counts), and the
synthetic corpus generator in ``..testing.corpus``.

All content is common public vocabulary; lists are frozen — changing them
changes golden fixtures.
"""

from __future__ import annotations

# Marker stopwords per language (lowercase). Chosen to be discriminative:
# no word appears in two lists.
STOPWORDS = {
    "en": (
        "the and of to in is that it for was with you this have are not "
        "from they his her been which were there would all will what"
    ).split(),
    "de": (
        "der die das und ist nicht ein eine mit von den dem für auf sich "
        "auch wird bei durch über nach wenn aber noch wie zum aus"
    ).split(),
    "fr": (
        "le les des une est dans pour que qui pas sur avec plus cette "
        "mais ont être aux ses nous vous leur fait tout même"
    ).split(),
    "es": (
        "el los las una es por para con del se su como más pero sus "
        "está entre también hasta donde porque muy sin años había"
    ).split(),
}

# Characteristic characters (appear in running text of that language).
CHARSETS = {
    "en": "",
    "de": "äöüßÄÖÜ",
    "fr": "àâçèêëîïôùûœÀÂÇÈÊËÎÏÔÙÛ",
    "es": "áíóúñ¿¡ÁÍÓÚÑ",
}

CJK_RANGE = ("一", "鿿")

# Content vocabulary per language for synthetic text + LM seed corpora.
CONTENT_WORDS = {
    "en": (
        "report market system analysis growth service product company data "
        "network public research development customer project management "
        "information technology process industry value performance quality "
        "business strategy review model result increase change support local "
        "national community education health policy energy finance travel "
        "weather science culture history design building morning evening"
    ).split(),
    "de": (
        "bericht markt system analyse wachstum dienst produkt unternehmen "
        "daten netzwerk forschung entwicklung kunde projekt verwaltung "
        "information technologie prozess industrie wert leistung qualität "
        "geschäft strategie prüfung modell ergebnis erhöhung änderung "
        "unterstützung gemeinde bildung gesundheit politik energie finanzen "
        "reise wetter wissenschaft kultur geschichte gestaltung gebäude"
    ).split(),
    "fr": (
        "rapport marché système analyse croissance service produit entreprise "
        "données réseau recherche développement client projet gestion "
        "information technologie processus industrie valeur performance "
        "qualité affaires stratégie examen modèle résultat augmentation "
        "changement soutien communauté éducation santé politique énergie "
        "finances voyage météo science culture histoire conception bâtiment"
    ).split(),
    "es": (
        "informe mercado sistema análisis crecimiento servicio producto "
        "empresa datos red investigación desarrollo cliente proyecto gestión "
        "información tecnología proceso industria valor rendimiento calidad "
        "negocio estrategia revisión modelo resultado aumento cambio apoyo "
        "comunidad educación salud política energía finanzas viaje tiempo "
        "ciencia cultura historia diseño edificio mañana tarde"
    ).split(),
    "zh": list(
        "市场系统分析增长服务产品公司数据网络研究发展客户项目管理信息技术"
        "过程工业价值性能质量业务战略审查模型结果增加变化支持社区教育健康"
        "政策能源金融旅行天气科学文化历史设计建筑早晨晚上报告国家经济社会"
    ),
}

LANGS = ("en", "de", "fr", "es", "zh")
