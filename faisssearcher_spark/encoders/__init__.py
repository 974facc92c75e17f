from faisssearcher_spark.encoders.base import Encoder, encoder_udf
from faisssearcher_spark.encoders.mock import HashingEncoder
from faisssearcher_spark.encoders.wordvec import WordVecEncoder

__all__ = ["Encoder", "encoder_udf", "HashingEncoder", "WordVecEncoder"]
