Feature: DrivingTable

  # DrivingTable acceptance-family mirror (reference: CypherSession
  # cypherOnGraph(drivingTable) / morpheus DrivingTableAcceptance):
  # queries driven by an incoming row set — here modeled the way the TCK
  # can express it: UNWIND / parameters producing rows BEFORE the first
  # MATCH, which is exactly how the engine plans a driving table
  # (planner.plan_single's initial Record).

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'ada', age: 10}),
             (:Person {name: 'bob', age: 20}),
             (:Person {name: 'cat', age: 30})
      """

  Scenario: UNWIND-driven match joins each driving row against the graph
    When executing query:
      """
      UNWIND ['ada', 'cat', 'zoe'] AS who
      MATCH (p:Person {name: who})
      RETURN who, p.age AS age
      """
    Then the result should be, in any order:
      | who   | age |
      | 'ada' | 10  |
      | 'cat' | 30  |
    And no side effects

  Scenario: OPTIONAL MATCH keeps driving rows with no graph match
    When executing query:
      """
      UNWIND ['ada', 'zoe'] AS who
      OPTIONAL MATCH (p:Person {name: who})
      RETURN who, p.age AS age
      """
    Then the result should be, in any order:
      | who   | age  |
      | 'ada' | 10   |
      | 'zoe' | null |
    And no side effects

  Scenario: Parameter list as the driving table
    And parameters are:
      | names | ['bob', 'cat'] |
    When executing query:
      """
      UNWIND $names AS who
      MATCH (p:Person) WHERE p.name = who
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
    And no side effects

  Scenario: Driving rows multiply matches, not the other way round
    When executing query:
      """
      UNWIND [1, 2] AS copy
      MATCH (p:Person)
      RETURN copy, count(*) AS n
      """
    Then the result should be, in any order:
      | copy | n |
      | 1    | 3 |
      | 2    | 3 |
    And no side effects

  Scenario: Driving values feed expression positions inside the match
    When executing query:
      """
      UNWIND [15, 25] AS cutoff
      MATCH (p:Person) WHERE p.age > cutoff
      RETURN cutoff, count(*) AS n
      """
    Then the result should be, in any order:
      | cutoff | n |
      | 15     | 2 |
      | 25     | 1 |
    And no side effects

  Scenario: WITH-projected driving table with aliased columns
    When executing query:
      """
      UNWIND [{who: 'ada', bonus: 5}, {who: 'bob', bonus: 7}] AS row
      WITH row.who AS who, row.bonus AS bonus
      MATCH (p:Person {name: who})
      RETURN who, p.age + bonus AS total
      """
    Then the result should be, in any order:
      | who   | total |
      | 'ada' | 15    |
      | 'bob' | 27    |
    And no side effects

  Scenario: Empty driving table produces no rows without error
    When executing query:
      """
      UNWIND [] AS who
      MATCH (p:Person {name: who})
      RETURN who
      """
    Then the result should be, in any order:
      | who |
    And no side effects

  Scenario: Driving values inside EXISTS property patterns
    When executing query:
      """
      UNWIND ['ada', 'zoe'] AS who
      MATCH (p:Person)
      WHERE EXISTS { (q:Person {name: who}) } AND p.name = who
      RETURN who
      """
    Then the result should be, in any order:
      | who   |
      | 'ada' |
    And no side effects
