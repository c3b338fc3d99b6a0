from .configuration import BertQuantizedConfig
from .modeling import bert_for_sequence_classification, bert_model
from .prepare import quantize_bert_params_ptq
from .quant_config import (
    format_stat_profiled_int_config_bert_quantized,
    parse_bert_quantized_config,
)
