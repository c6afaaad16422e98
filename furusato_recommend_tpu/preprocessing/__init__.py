"""Incremental feature-engineering pipeline (host-side; SURVEY.md §2.5).

Every class follows the reference's initialize-then-update protocol so features
extend when new products/customers/transactions arrive without full recompute
(`/root/reference/preprocessing_main.py:12-126` is the executable spec; our
integration test tests/test_preprocessing.py mirrors it)."""

from .artifacts import write_artifacts
from .pipeline import run_preprocessing
from .filtering import five_core, k_core, read_recbole, ten_core, write_recbole
from .categorical import (
    CategoricalFeature,
    CustomerCategoricalFeature,
    OrdinalEncoder,
    ProductCategoricalFeature,
)
from .category import CategoryInfo, ProductCategoryInfo, padded_categories
from .ids import CustomerIDInfo, ProductIDInfo, TimeProcessing, TransactionInfo, birth_year
from .numeric import CustomerNumericFeature, FeatureCounter, ProductNumericFeature
from .partner import PartnerMerge
from .text import ProductReviewFeature, ProductTextFeature, join_nouns

__all__ = [
    "write_artifacts",
    "run_preprocessing",
    "k_core",
    "five_core",
    "ten_core",
    "write_recbole",
    "read_recbole",
    "OrdinalEncoder",
    "CategoricalFeature",
    "ProductCategoricalFeature",
    "CustomerCategoricalFeature",
    "CategoryInfo",
    "ProductCategoryInfo",
    "padded_categories",
    "ProductIDInfo",
    "CustomerIDInfo",
    "TransactionInfo",
    "TimeProcessing",
    "birth_year",
    "FeatureCounter",
    "CustomerNumericFeature",
    "ProductNumericFeature",
    "PartnerMerge",
    "ProductTextFeature",
    "ProductReviewFeature",
    "join_nouns",
]
