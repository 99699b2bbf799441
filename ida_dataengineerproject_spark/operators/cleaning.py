"""Row/value cleaning + dictionary recode operators (SURVEY.md §2.2, §2.4).

Reference:
- null-row filter (op11): etl/etl_ida.py:318-327.
- invalid-cell filter (op12): etl/etl_ida.py:342-343 ({NaN, '-', '', 'nan'}).
- trim + whitespace collapse (op18): etl/etl_ida.py:398-404.
- group recode (op19): etl/etl_ida.py:406-420 (10 entries, pass-through miss).
- variable recode (op20): etl/etl_ida.py:178-192 (12 entries, pass-through).

Recodes are literal ``F.create_map`` lookups — constant-folded by Catalyst,
no join, no UDF; at 100 TB a 10-entry map literal beats even a broadcast join
(zero build side, pure codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# etl/etl_ida.py:406-420 — raw economic-group name → short code.
GROUP_MAPPING = {
    "ALGAR (CTBC TELECOM)": "ALGAR",
    "ALGAR": "ALGAR",
    "CLARO S.A.": "CLARO",
    "GRUPO CLARO": "CLARO",
    "TELEFÔNICA BRASIL S.A.": "VIVO",
    "GRUPO TELEFÔNICA/VIVO": "VIVO",
    "TIM S.A.": "TIM",
    "GRUPO TIM": "TIM",
    "OI S.A.": "OI",
    "GRUPO OI": "OI",
    "NET SERVIÇOS": "NET",
    "SKY BRASIL": "SKY",
    "EMBRATEL": "EMBRATEL",
    "NEXTEL TELECOMUNICAÇÕES": "NEXTEL",
    "SERCOMTEL S.A.": "SERCOMTEL",
}

# etl/etl_ida.py:178-192 — long variable label → stable code.
VARIABLE_MAPPING = {
    "Indicador de Desempenho no Atendimento (IDA)": "IDA",
    "Índice de Reclamações": "INDICE_RECL",
    "Quantidade de acessos em serviço": "QTD_ACESSOS",
    "Quantidade de reclamações reabertas": "QTD_REABERTAS",
    "Quantidade de Reclamações": "QTD_RECLAMACOES",
    "Quantidade de reclamações no período": "QTD_RECL_PERIODO",
    "Quantidade de Reclamações Respondidas": "QTD_RESPONDIDAS",
    "Quantidade de reclamações respondidas em até 5 dias úteis": "QTD_RESP_5DIAS",
    "Taxa de reclamações reabertas": "TAXA_REABERTAS",
    "Taxa de Respondidas em 5 dias Úteis": "TAXA_RESP_5DIAS",
    "Taxa de Respondidas no Período": "TAXA_RESP_PERIODO",
}

_INVALID_CELLS = ["-", "", "nan", "NaN"]


def clean_text(col: Column | str) -> Column:
    """Trim + collapse internal whitespace (op18, etl/etl_ida.py:398-404)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), r"\s+", " ")


def drop_blank_rows(df: DataFrame, *cols: str) -> DataFrame:
    """Drop rows where any of ``cols`` is NULL/blank/'nan'
    (op11, etl/etl_ida.py:318-327)."""
    out = df
    for c in cols:
        cleaned = F.trim(F.col(c))
        out = out.filter(
            F.col(c).isNotNull() & (cleaned != "") & (F.lower(cleaned) != "nan")
        )
    return out


def drop_invalid_values(df: DataFrame, col: str) -> DataFrame:
    """Drop unparseable measure cells (op12, etl/etl_ida.py:342-343)."""
    c = F.col(col)
    return df.filter(c.isNotNull() & ~F.trim(c).isin(_INVALID_CELLS))


def recode(col: Column | str, mapping: dict[str, str]) -> Column:
    """Exact-match dictionary recode with pass-through on miss
    (op19/op20).  Literal map → coalesce; constant-folded, codegen'd.
    """
    c = F.col(col) if isinstance(col, str) else col
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return F.coalesce(m[clean_text(c)], clean_text(c))
