from .rio import parse_turtle, quads_df_from_list, read_triples, write_triples  # noqa: F401
