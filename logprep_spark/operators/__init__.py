"""Processor registry — one class per reference processor
(/root/reference/logprep/processor/*, re-expressed Spark-first)."""

from logprep_spark.operators.base import Pipeline, Processor, Rule
from logprep_spark.operators.amides import Amides
from logprep_spark.operators.calculator import Calculator
from logprep_spark.operators.clusterer import Clusterer
from logprep_spark.operators.concatenator import Concatenator
from logprep_spark.operators.datetime_extractor import DatetimeExtractor
from logprep_spark.operators.decoder import Decoder
from logprep_spark.operators.deduplicator import Deduplicator
from logprep_spark.operators.deleter import Deleter
from logprep_spark.operators.dissector import Dissector
from logprep_spark.operators.domain_label_extractor import DomainLabelExtractor
from logprep_spark.operators.domain_resolver import DomainResolver
from logprep_spark.operators.dropper import Dropper
from logprep_spark.operators.field_manager import FieldManager
from logprep_spark.operators.generic_adder import GenericAdder
from logprep_spark.operators.generic_resolver import GenericResolver
from logprep_spark.operators.geoip_enricher import GeoipEnricher
from logprep_spark.operators.grokker import Grokker
from logprep_spark.operators.ip_informer import IpInformer
from logprep_spark.operators.key_checker import KeyChecker
from logprep_spark.operators.labeler import Labeler
from logprep_spark.operators.list_comparison import ListComparison
from logprep_spark.operators.network_comparison import NetworkComparison
from logprep_spark.operators.pre_detector import PreDetector
from logprep_spark.operators.pseudonymizer import Pseudonymizer
from logprep_spark.operators.replacer import Replacer
from logprep_spark.operators.requester import Requester
from logprep_spark.operators.selective_extractor import SelectiveExtractor
from logprep_spark.operators.string_splitter import StringSplitter
from logprep_spark.operators.template_replacer import TemplateReplacer
from logprep_spark.operators.timestamp_differ import TimestampDiffer
from logprep_spark.operators.timestamper import Timestamper

PROCESSORS = {
    cls.rule_type: cls
    for cls in [
        Amides,
        Calculator,
        Clusterer,
        Concatenator,
        DatetimeExtractor,
        Decoder,
        Deduplicator,
        Deleter,
        Dissector,
        DomainLabelExtractor,
        DomainResolver,
        Dropper,
        FieldManager,
        GenericAdder,
        GenericResolver,
        GeoipEnricher,
        Grokker,
        IpInformer,
        KeyChecker,
        Labeler,
        ListComparison,
        NetworkComparison,
        PreDetector,
        Pseudonymizer,
        Replacer,
        Requester,
        SelectiveExtractor,
        StringSplitter,
        TemplateReplacer,
        TimestampDiffer,
        Timestamper,
    ]
}

__all__ = ["Pipeline", "Processor", "Rule", "PROCESSORS", *[c.__name__ for c in PROCESSORS.values()]]
