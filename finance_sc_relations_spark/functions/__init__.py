from .text_clean import CLEAN_PATTERN, clean_text_col, rm_special_char  # noqa: F401
from .relations import (  # noqa: F401
    INVERSE_DICT,
    LABELS,
    LABEL2ID,
    ID2LABEL,
    MAIN_RELATIONS,
    assign_relation,
    resort_relation,
    return_possible_pairs,
    sc_label_from_relations,
    check_relation_tuples,
    get_other_relations,
)
from .tagging import (  # noqa: F401
    entity_annotation,
    word_search,
    inverse_relations,
    extract_tagged_names,
    mutate_sent,
)
from .similarity import HashEmbedder, cosine_matrix  # noqa: F401
