from .conditional import SearchIntQuantisationForClassification
from .engine import (
    FrozenTrial,
    SAMPLER_MAP,
    Study,
    Trial,
    create_study,
    get_sampler,
    non_dominated_sort,
)
from .prompting import (
    SearchIntQuantisationForPromptingCLS,
    SearchQuantisationForPromptingCLS,
)
from .samplers_model import MODEL_SAMPLER_MAP, get_model_sampler
from .search import SearchBase, SearchQuantisationForClassification
