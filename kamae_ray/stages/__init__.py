"""All transformer / estimator stages."""

from kamae_ray.stages.elementwise import (  # noqa: F401
    BitHammingTransformer,
    AbsoluteValueTransformer,
    BinTransformer,
    BucketizeTransformer,
    ClipTransformer,
    CoalesceTransformer,
    CyclicalEncodeTransformer,
    DivideTransformer,
    PolynomialExpandTransformer,
    ExponentTransformer,
    ExpTransformer,
    IdentityTransformer,
    IfStatementTransformer,
    LogicalAndTransformer,
    LogicalNotTransformer,
    LogicalOrTransformer,
    LogTransformer,
    MaxTransformer,
    MeanTransformer,
    MinTransformer,
    ModuloTransformer,
    MultiplyTransformer,
    NumericalIfStatementTransformer,
    RoundToDecimalTransformer,
    RoundTransformer,
    StringMapTransformer,
    SubtractTransformer,
    SumTransformer,
)
from kamae_ray.stages.strings import (  # noqa: F401
    IpToIntTransformer,
    JsonExtractTransformer,
    StringAffixTransformer,
    UrlDomainTransformer,
    StringArrayConstantTransformer,
    StringCaseTransformer,
    Base64DecodeTransformer,
    HexEncodeTransformer,
    SoundexTransformer,
    Base64EncodeTransformer,
    EditDistanceTransformer,
    StringConcatenateTransformer,
    StringContainsListTransformer,
    StringContainsTransformer,
    StringIsInListTransformer,
    StringListToStringTransformer,
    StringReplaceTransformer,
    StringToStringListTransformer,
    SubStringDelimAtIndexTransformer,
)
from kamae_ray.stages.dates import (  # noqa: F401
    CurrentDateTimeTransformer,
    CurrentDateTransformer,
    CurrentUnixTimestampTransformer,
    DateAddTransformer,
    DateDiffTransformer,
    DateParseTransformer,
    DateTimeToUnixTimestampTransformer,
    UnixTimestampToDateTimeTransformer,
)
from kamae_ray.stages.array_ops import (  # noqa: F401
    ArrayConcatenateTransformer,
    ArrayCropTransformer,
    ArrayDistinctSortTransformer,
    ArraySetOpTransformer,
    ArrayReduceMaxTransformer,
    ArraySplitTransformer,
    ArraySubtractMinimumTransformer,
    OrdinalArrayEncodeTransformer,
    StringSequenceToEmbeddingTransformer,
)
from kamae_ray.stages.similarity import (  # noqa: F401
    BearingAngleTransformer,
    CosineSimilarityTransformer,
    HaversineDistanceTransformer,
    L2NormalizeTransformer,
    PairwiseCosineSimilarityTransformer,
)
from kamae_ray.stages.linalg import (  # noqa: F401
    LinearScoreTransformer,
    PCAProjectEstimator,
    PCAProjectTransformer,
)
from kamae_ray.stages.hashing import (  # noqa: F401
    BloomEncodeTransformer,
    FeatureCrossTransformer,
    HashIndexTransformer,
    HashSplitTransformer,
    MinHashIndexTransformer,
)
from kamae_ray.stages.scalers import (  # noqa: F401
    ConditionalStandardScaleEstimator,
    ConditionalStandardScaleTransformer,
    GroupedBucketizeTransformer,
    GroupedImputeEstimator,
    GroupedImputeTransformer,
    GroupedQuantileBucketizeEstimator,
    ImputeEstimator,
    ImputeTransformer,
    MinMaxScaleEstimator,
    MinMaxScaleTransformer,
    QuantileBucketizeEstimator,
    RobustScaleEstimator,
    SingleFeatureArrayStandardScaleEstimator,
    StandardScaleEstimator,
    StandardScaleTransformer,
    WinsorizeEstimator,
    GroupedStandardScaleEstimator,
    GroupedStandardScaleTransformer,
)
from kamae_ray.stages.indexers import (  # noqa: F401
    OneHotEncodeEstimator,
    OneHotEncodeTransformer,
    SharedOneHotEncodeEstimator,
    SharedOneHotEncodeTransformer,
    SharedStringIndexEstimator,
    SharedStringIndexTransformer,
    CountEncodeEstimator,
    CountEncodeTransformer,
    RareLabelEncoderEstimator,
    RareLabelTransformer,
    StringIndexEstimator,
    StringIndexTransformer,
    LooTargetEncodeEstimator,
    LooTargetEncodeTransformer,
    TargetEncodeEstimator,
    TargetEncodeTransformer,
    WoeEncodeEstimator,
    cv_target_encode,
)
from kamae_ray.stages.listwise import (  # noqa: F401
    ListMaxTransformer,
    ListMeanTransformer,
    ListMedianTransformer,
    ListMinTransformer,
    ListRankTransformer,
    ListStdDevTransformer,
)
from kamae_ray.stages.window import (  # noqa: F401
    BackfillTransformer,
    CumulativeAggTransformer,
    EwmMeanTransformer,
    KeyedWindowTransformer,
    LagTransformer,
    LeadTransformer,
    RollingAggTransformer,
    SessionizeTransformer,
    TimeRangeRollingTransformer,
    WindowRankTransformer,
    WindowValueTransformer,
    asof_join,
    broadcast_asof_join,
    broadcast_range_join,
    range_join,
)
from kamae_ray.stages.lambda_fn import LambdaFunctionTransformer  # noqa: F401
from kamae_ray.stages.text import (  # noqa: F401
    ReadabilityTransformer,
    CharDiversityTransformer,
    FingerprintTransformer,
    GopherQualityTransformer,
    HashingVectorizerTransformer,
    LanguageIdTransformer,
    LineFilterTransformer,
    NGramTransformer,
    QualityScoreTransformer,
    RedactPiiTransformer,
    RepetitionSignalsTransformer,
    TextNormalizeTransformer,
    TokenCountTransformer,
    TokenizeTransformer,
)
from kamae_ray.stages.multimodal import (  # noqa: F401
    PpmDecodeTransformer,
    BinaryFeatureExtractTransformer,
    FrameSampleTransformer,
    PgmAverageHashTransformer,
    PgmDecodeTransformer,
    PgmResizeTransformer,
    SpectrogramTransformer,
    WavDecodeTransformer,
)
from kamae_ray.stages.join import broadcast_join, fuzzy_join, shuffle_join  # noqa: F401
from kamae_ray.stages.aggregate import (  # noqa: F401
    except_distinct,
    groupby_agg,
    groupby_collect,
    intersect_distinct,
)
from kamae_ray.stages.diff import snapshot_diff  # noqa: F401
from kamae_ray.stages.reshape import explode, melt, pivot  # noqa: F401
from kamae_ray.stages.sketches import (  # noqa: F401
    approx_count_distinct,
    groupby_approx_count_distinct,
)
from kamae_ray.stages.profile import profile_columns  # noqa: F401
from kamae_ray.stages.evalmetrics import (  # noqa: F401
    confusion_by_group,
    ks_statistic,
    lift_table,
    ranking_metrics,
)
from kamae_ray.stages.privacy import k_anonymize, l_diversity  # noqa: F401
from kamae_ray.stages.profile import anova_f_by_group, cramers_v  # noqa: F401
from kamae_ray.stages.text import lexical_stats  # noqa: F401
from kamae_ray.stages.similarity import QuantizeEmbeddingTransformer  # noqa: F401
