"""scio_sparql_spark — a PySpark-native SPARQL 1.1 SELECT engine plus
large-scale data-pipeline operators (dedup, similarity, text analysis).

A from-scratch rebuild of the capabilities of jordiolivares/scio-sparql
(Scio/Beam; reference at /root/reference) on the Spark DataFrame stack:
declarative plans, Catalyst optimization, Tungsten execution.
"""

from .engine import execute_sparql  # noqa: F401
from .functions.registry import (  # noqa: F401
    pandas_scalar_builder,
    register_function,
    unregister_function,
)
from .sources.results import (  # noqa: F401
    to_result_csv_df,
    to_result_json,
    to_result_json_df,
    to_result_tsv_df,
    to_result_xml,
    to_result_xml_boolean,
    to_result_xml_df,
)
from .sources.rio import (  # noqa: F401
    parse_jsonld,
    parse_turtle,
    quads_df_from_list,
    read_triples,
    read_triples_stream,
    to_jsonld,
    to_jsonld_df,
    to_ntriples_df,
    to_rdfxml,
    to_trig,
    to_trix,
    to_turtle,
    to_turtle_df,
    write_triples,
    write_triples_nt,
)
from .terms import QUADS_SCHEMA, TERM_TYPE, Term  # noqa: F401
from .update import execute_update  # noqa: F401

__version__ = "0.1.0"
