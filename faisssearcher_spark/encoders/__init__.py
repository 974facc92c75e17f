from faisssearcher_spark.encoders.base import Encoder, encoder_udf
from faisssearcher_spark.encoders.mock import HashingEncoder

__all__ = ["Encoder", "encoder_udf", "HashingEncoder"]
