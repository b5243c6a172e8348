from sagan_spark.rules.model import (  # noqa: F401
    AfterGate,
    ContentMatch,
    JsonContent,
    JsonMetaContent,
    JsonPcre,
    PcreMatch,
    Rule,
    ThresholdGate,
    XbitOp,
)
from sagan_spark.rules.parser import parse_rules  # noqa: F401
