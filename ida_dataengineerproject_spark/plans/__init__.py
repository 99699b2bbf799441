from .taxa_variacao import taxa_variacao, TAXA_VARIACAO_ORACLE_SQL  # noqa: F401
