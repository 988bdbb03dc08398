Feature: OutlineParams

  Scenario Outline: Arithmetic precedence
    Given an empty graph
    When executing query:
      """
      RETURN <lhs> + <rhs> * 2 AS out
      """
    Then the result should be, in any order:
      | out        |
      | <expected> |
    And no side effects

    Examples:
      | lhs | rhs | expected |
      | 1   | 2   | 5        |
      | 0   | 0   | 0        |
      | 3   | -1  | 1        |

  Scenario Outline: String predicates
    Given an empty graph
    And having executed:
      """
      CREATE (:W {s: 'apple'}), (:W {s: 'banana'}), (:W {s: 'apricot'})
      """
    When executing query:
      """
      MATCH (w:W) WHERE w.s <pred> RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n          |
      | <expected> |
    And no side effects

    Examples:
      | pred               | expected |
      | STARTS WITH 'ap'   | 2        |
      | ENDS WITH 'a'      | 1        |
      | CONTAINS 'an'      | 1        |

  Scenario: Parameterized predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N {v: 3})
      """
    And parameters are:
      | min | 2 |
    When executing query:
      """
      MATCH (n:N) WHERE n.v >= $min RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
    And no side effects

  Scenario: Parameterized list and string
    Given an empty graph
    And parameters are:
      | xs   | [1, 2, 3] |
      | name | 'ok'      |
    When executing query:
      """
      RETURN size($xs) AS n, $name AS name
      """
    Then the result should be, in any order:
      | n | name |
      | 3 | 'ok' |
    And no side effects
